"""Trainer-integrated fused-kernel path (interpreter mode on CPU)."""

import numpy as np

from come_tpu.config import get_config
from come_tpu.graphs import get_dataset
from come_tpu.trainer import ComETrainer


def test_full_loop_through_fused_kernels():
    """pallas='always' routes O1 through fused_sgns_step and O2 through
    fused_sgns_step_tied (interpret mode off-TPU); quality must hold."""
    ds = get_dataset("karate")
    cfg = get_config("karate").replace(
        negative_mode="shared",
        shared_negatives=32,
        pallas="always",
        pallas_tile_pairs=64,
        outer_iters=1,
        pretrain_epochs=2,
        walks_per_node=4,
    )
    t = ComETrainer(ds.graph, cfg)
    hist = t.train(labels=ds.labels)
    assert np.isfinite(hist[-1]["o1_loss"])
    assert np.isfinite(hist[-1]["o2_loss"])
    assert hist[-1]["nmi"] > 0.3, hist
