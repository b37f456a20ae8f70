"""End-to-end Karate training (BASELINE.json config 1: the PR1 gate)."""

import numpy as np
import pytest

from come_tpu.config import get_config
from come_tpu.evaluation import nmi_score
from come_tpu.graphs import get_dataset
from come_tpu.trainer import ComETrainer


@pytest.fixture(scope="module")
def karate():
    return get_dataset("karate")


def test_o1_only_learns_karate_communities(karate):
    """DeepWalk mode: O1 skip-gram only; embeddings must separate the clubs."""
    cfg = get_config("karate").replace(outer_iters=0, pretrain_epochs=6)
    t = ComETrainer(karate.graph, cfg)
    first = t.o1_epoch()
    for _ in range(5):
        last = t.o1_epoch()
    assert last < first  # loss decreases
    # cluster the raw embeddings with our GMM fit -> NMI vs ground truth
    t.fit_gmm()
    nmi = nmi_score(karate.labels, t.communities())
    assert nmi > 0.3, nmi


def test_full_come_loop_improves_nmi(karate):
    cfg = get_config("karate")
    t = ComETrainer(karate.graph, cfg)
    hist = t.train(labels=karate.labels)
    assert len(hist) == cfg.outer_iters
    final_nmi = hist[-1]["nmi"]
    assert final_nmi > 0.5, hist
    # losses are finite and recorded
    for rec in hist:
        for k in ("o1_loss", "o2_loss", "o3_loss", "gmm_ll"):
            assert np.isfinite(rec[k]), rec


def test_determinism_same_seed(karate):
    """SURVEY.md §5: synchronous scatter-add makes training deterministic."""
    cfg = get_config("karate").replace(outer_iters=1, pretrain_epochs=1)
    e1 = ComETrainer(karate.graph, cfg)
    e1.train(labels=None)
    e2 = ComETrainer(karate.graph, cfg)
    e2.train(labels=None)
    np.testing.assert_array_equal(e1.embeddings(), e2.embeddings())


def test_checkpoint_roundtrip(tmp_path, karate):
    from come_tpu.iohelpers import load_checkpoint, save_checkpoint

    cfg = get_config("karate").replace(outer_iters=1, pretrain_epochs=1)
    t = ComETrainer(karate.graph, cfg)
    t.train()
    ckpt = tmp_path / "state.npz"
    save_checkpoint(ckpt, t.state)
    restored = load_checkpoint(ckpt)
    np.testing.assert_array_equal(
        np.asarray(restored.params.node_emb), t.embeddings()
    )
    np.testing.assert_array_equal(
        np.asarray(restored.words_seen), np.asarray(t.state.words_seen)
    )
    # resumed training continues without error and stays deterministic
    t.state = restored
    t.o1_epoch()


def test_checkpoint_resume_bit_exact(tmp_path, karate):
    """Trainer save/load restores the HOST permutation RNG too: the resumed
    run reproduces the uninterrupted trajectory bit-exactly with no manual
    host_key alignment (code-review r3 finding)."""
    cfg = get_config("karate").replace(outer_iters=0, pretrain_epochs=1)
    t = ComETrainer(karate.graph, cfg)
    t.o1_epoch()
    ckpt = tmp_path / "state.npz"
    t.save_checkpoint(ckpt)
    t2 = ComETrainer(karate.graph, cfg)  # fresh host_key
    t2.load_checkpoint(ckpt)
    assert t.o1_epoch() == t2.o1_epoch()
    np.testing.assert_array_equal(t.embeddings(), t2.embeddings())


def test_word2vec_text_roundtrip(tmp_path):
    from come_tpu.iohelpers import (
        load_embedding_word2vec,
        save_embedding_word2vec,
    )

    emb = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    p = tmp_path / "emb.txt"
    save_embedding_word2vec(p, emb, node_names=["a", "b", "c", "d", "e"])
    back, names = load_embedding_word2vec(p)
    assert names == ["a", "b", "c", "d", "e"]
    np.testing.assert_allclose(back, emb, atol=1e-5)


def test_walk_cache_cadence():
    """walk_regen_epochs: 0 = generate once and reuse; N = every N epochs."""
    import jax.numpy as jnp

    from come_tpu.config import ComEConfig
    from come_tpu.graphs import sbm_graph
    from come_tpu.trainer import ComETrainer

    g, _ = sbm_graph(64, 4, p_in=0.3, p_out=0.02, seed=0)
    cfg = ComEConfig(
        dim=16, num_communities=4, walk_length=8, walks_per_node=2,
        window=3, negative=3, batch_walks=16, batch_pairs=256,
        walk_regen_epochs=0,
    )
    t = ComETrainer(g, cfg)
    l0 = t.o1_epoch()
    c0 = t._walk_cache
    l1 = t.o1_epoch()
    assert t._walk_cache is c0  # reused, not regenerated
    assert jnp.isfinite(l0) and jnp.isfinite(l1)

    t2 = ComETrainer(g, cfg.replace(walk_regen_epochs=2))
    t2.o1_epoch()
    c0 = t2._walk_cache
    t2.o1_epoch()
    assert t2._walk_cache is c0  # epoch 1: still cached
    t2.o1_epoch()
    assert t2._walk_cache is not c0  # epoch 2: regenerated


def test_restart_prob_reaches_corpus():
    """config.restart_prob threads into the trainer's walk generation
    (reference ``random_walk`` alpha [R]): a high restart prob keeps path
    walks pinned near their origin."""
    import numpy as np

    from come_tpu.config import ComEConfig
    from come_tpu.graphs import CSRGraph
    from come_tpu.trainer import ComETrainer

    n = 200
    g = CSRGraph.from_arcs(np.arange(n - 1), np.arange(1, n), num_nodes=n)
    base = ComEConfig(
        dim=8, num_communities=2, walk_length=20, walks_per_node=1,
        window=3, negative=2, batch_walks=32, batch_pairs=256,
        walk_regen_epochs=0,
    )
    t0 = ComETrainer(g, base)
    t0.o1_epoch()
    drift0 = float(np.asarray(t0._walk_cache).max())
    t1 = ComETrainer(g, base.replace(restart_prob=0.8))
    t1.o1_epoch()
    w1 = np.asarray(t1._walk_cache)
    # restarts return walks to their origins often...
    origins = w1[..., :1]
    assert (w1 == origins).mean() > 0.3
    # ...and prevent the long drift the restart-free corpus shows
    assert drift0 == n - 1  # some walk reaches the path's end
