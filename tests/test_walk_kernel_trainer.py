"""Walk-banded kernel through the trainer (interpret mode, SBM graph)."""

import numpy as np

from come_tpu.config import ComEConfig
from come_tpu.evaluation import nmi_score
from come_tpu.graphs import sbm_graph
from come_tpu.trainer import ComETrainer


def _cfg(**kw):
    base = dict(
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
    )
    base.update(kw)
    return ComEConfig(**base)


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


def test_walk_kernel_data_parallel_mesh():
    """DP fused path: kernel per data shard, deltas psum'd, replicas equal."""
    import jax
    import jax.numpy as jnp

    from come_tpu.parallel import ShardedComETrainer, make_mesh

    g, labels = sbm_graph(512, 4, p_in=0.2, p_out=0.01, seed=3)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    t = ShardedComETrainer(g, _cfg(batch_walks=64), mesh)
    assert t._use_walk_kernel()
    first = t.o1_epoch()
    losses = [t.o1_epoch() for _ in range(5)]
    assert np.isfinite(first) and losses[-1] < first
    # replicas of the table must be bit-identical across the data axis
    shards = [
        np.asarray(s.data) for s in t.state.params.node_emb.addressable_shards
    ]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    t.fit_gmm()
    assert nmi_score(labels, t.communities()) > 0.5


def test_walk_kernel_requires_model_1():
    """Row-sharded tables (model>1) fall back to the XLA sharded path."""
    import jax

    from come_tpu.parallel import ShardedComETrainer, make_mesh

    g, _ = sbm_graph(512, 4, p_in=0.2, p_out=0.01, seed=3)
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    t = ShardedComETrainer(g, _cfg(), mesh)
    assert not t._use_walk_kernel()
    assert np.isfinite(t.o1_epoch())  # XLA path still trains
