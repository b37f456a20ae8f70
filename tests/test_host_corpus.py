"""Host-corpus (C++ feeder) training mode."""

import numpy as np
import pytest

from come_tpu.config import get_config
from come_tpu.evaluation import nmi_score
from come_tpu.graphs import get_dataset
from come_tpu.native import native_available
from come_tpu.trainer import ComETrainer

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


def test_host_corpus_o1_trains_karate():
    ds = get_dataset("karate")
    # pretrain_epochs sizes the LR-decay word budget for the manual calls
    cfg = get_config("karate").replace(
        corpus="host", outer_iters=0, pretrain_epochs=6
    )
    t = ComETrainer(ds.graph, cfg)
    first = t.o1_epoch()
    losses = [t.o1_epoch() for _ in range(5)]
    assert losses[-1] < first
    t.fit_gmm()
    assert nmi_score(ds.labels, t.communities()) > 0.2
    t._host_feeder.close()


def test_host_corpus_full_loop():
    ds = get_dataset("karate")
    cfg = get_config("karate").replace(
        corpus="host", outer_iters=1, pretrain_epochs=2
    )
    t = ComETrainer(ds.graph, cfg)
    hist = t.train(labels=ds.labels)
    assert np.isfinite(hist[-1]["o1_loss"])
    assert hist[-1]["nmi"] > 0.3
    t._host_feeder.close()
