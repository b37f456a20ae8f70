"""Walk-banded kernel through the trainer (interpret mode, SBM graph)."""

import numpy as np

from come_tpu.config import ComEConfig
from come_tpu.evaluation import nmi_score
from come_tpu.graphs import sbm_graph
from come_tpu.trainer import ComETrainer


def _cfg(**kw):
    return ComEConfig(
        dim=128,  # kernel requires lane-width embeddings
        num_communities=4,
        walk_length=16,
        walks_per_node=2,
        window=4,
        negative_mode="shared",
        # pool coverage: the walk kernel refreshes its negative pool once
        # per macro step, so pool-draws/epoch = macros * KP must be >= ~2V
        # for healthy repulsion (here 16 * 128 = 2048 for V=512)
        shared_negatives=128,
        pallas="always",
        batch_walks=32,
        batch_edges=1024,
        batch_pairs=4096,
        lr=0.025,
        outer_iters=0,
        pretrain_epochs=8,
        gmm_max_iter=20,
        reg_covar=1e-2,
        **kw,
    )


def test_walk_kernel_selected_and_trains():
    g, labels = sbm_graph(512, 4, p_in=0.2, p_out=0.01, seed=3)
    t = ComETrainer(g, _cfg())
    assert t._use_walk_kernel()
    first = t.o1_epoch()
    losses = [t.o1_epoch() for _ in range(7)]
    assert np.isfinite(first) and losses[-1] < first
    t.fit_gmm()
    assert nmi_score(labels, t.communities()) > 0.5


def test_tiny_graph_falls_back():
    from come_tpu.config import get_config
    from come_tpu.graphs import get_dataset

    ds = get_dataset("karate")
    cfg = get_config("karate").replace(
        negative_mode="shared", pallas="always"
    )
    t = ComETrainer(ds.graph, cfg)
    assert not t._use_walk_kernel()  # collision gate
