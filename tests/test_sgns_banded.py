"""Banded XLA SGNS (the large-V HBM tier) vs a per-pair numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from come_tpu.losses.sgns_banded import (
    banded_block_grads,
    banded_walk_sgns_step,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _oracle_block(emb_in, emb_out, walks, pool, wrow, negw):
    """Promoted to evaluation/oracle.py (walk_banded_shared_pool_grads);
    kept as a thin alias so the banded tests and the parity harness share
    ONE definition of the fast path's expected gradients."""
    from come_tpu.evaluation.oracle import walk_banded_shared_pool_grads

    return walk_banded_shared_pool_grads(
        emb_in, emb_out, walks, pool, wrow, negw
    )


@pytest.mark.parametrize("W", [1, 3])
def test_banded_block_grads_match_oracle(rng, W):
    V, d, B, L, KP = 30, 8, 3, 7, 4
    emb_in = rng.normal(size=(V, d)).astype(np.float32) * 0.3
    emb_out = rng.normal(size=(V, d)).astype(np.float32) * 0.3
    walks = rng.integers(0, V, size=(B, L)).astype(np.int32)
    pool = rng.integers(0, V, size=(KP,)).astype(np.int32)
    wrow = rng.integers(1, W + 1, size=(B, L)).astype(np.int32)
    negw = 5.0 / KP

    phi = jnp.asarray(emb_in)[jnp.asarray(walks)]
    ctx = jnp.asarray(emb_out)[jnp.asarray(walks)]
    cneg = jnp.asarray(emb_out)[jnp.asarray(pool)]
    loss, npairs, (d_phi, d_ctx, d_cneg) = banded_block_grads(
        phi, ctx, cneg, jnp.asarray(wrow), negw
    )

    o_loss, o_npairs, o_din, o_dout = _oracle_block(
        emb_in, emb_out, walks, pool, wrow, negw
    )

    # fold the per-slot/per-pool gradients back to full tables
    d_in = np.zeros_like(emb_in)
    np.add.at(d_in, walks.reshape(-1), np.asarray(d_phi).reshape(-1, d))
    d_out = np.zeros_like(emb_out)
    np.add.at(d_out, walks.reshape(-1), np.asarray(d_ctx).reshape(-1, d))
    np.add.at(d_out, pool, np.asarray(d_cneg))

    assert int(npairs) == o_npairs
    np.testing.assert_allclose(float(loss), o_loss, rtol=2e-5)
    np.testing.assert_allclose(d_in, o_din, atol=2e-5)
    np.testing.assert_allclose(d_out, o_dout, atol=2e-5)


def test_step_blocks_apply_sequentially(rng):
    """A 2-block step == two single-block steps applied in sequence."""
    V, d, L, Bc = 25, 8, 6, 4
    emb_in = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32) * 0.3)
    emb_out = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32) * 0.3)
    walks = jnp.asarray(rng.integers(0, V, size=(2 * Bc, L)), jnp.int32)
    pool = jnp.asarray(rng.integers(0, V, size=(6,)), jnp.int32)
    key = jax.random.key(0)

    a_in, a_out, a_loss, a_np = banded_walk_sgns_step(
        emb_in, emb_out, walks, pool, 0.05, 0.5, key,
        window=2, walk_block=Bc, reduced_window=False, mxu_bf16=False,
    )
    # sequential single blocks (same full-window draw => same math)
    b_in, b_out = emb_in, emb_out
    tot_loss = tot_np = 0.0
    for blk in (walks[:Bc], walks[Bc:]):
        b_in, b_out, ls, n = banded_walk_sgns_step(
            b_in, b_out, blk, pool, 0.05, 0.5, key,
            window=2, walk_block=Bc, reduced_window=False, mxu_bf16=False,
        )
        tot_loss += float(ls)
        tot_np += float(n)
    np.testing.assert_allclose(np.asarray(a_in), np.asarray(b_in), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_out), np.asarray(b_out), atol=1e-5)
    np.testing.assert_allclose(float(a_loss), tot_loss, rtol=1e-5)
    assert float(a_np) == tot_np


def test_sorted_scatter_matches_plain(rng):
    V, d, L = 20, 8, 6
    emb_in = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32) * 0.3)
    emb_out = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32) * 0.3)
    walks = jnp.asarray(rng.integers(0, V, size=(8, L)), jnp.int32)
    pool = jnp.asarray(rng.integers(0, V, size=(5,)), jnp.int32)
    key = jax.random.key(1)
    outs = []
    for srt in (True, False):
        outs.append(
            banded_walk_sgns_step(
                emb_in, emb_out, walks, pool, 0.05, 1.0, key,
                window=2, walk_block=4, mxu_bf16=False, sorted_scatter=srt,
            )
        )
    np.testing.assert_allclose(
        np.asarray(outs[0][0]), np.asarray(outs[1][0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(outs[0][1]), np.asarray(outs[1][1]), atol=1e-5
    )


def test_trainer_banded_path_trains():
    """Force the banded tier through the trainer on an SBM; NMI improves."""
    from come_tpu.config import ComEConfig
    from come_tpu.evaluation import nmi_score
    from come_tpu.graphs import sbm_graph
    from come_tpu.trainer import ComETrainer

    g, labels = sbm_graph(512, 4, p_in=0.2, p_out=0.01, seed=3)
    cfg = ComEConfig(
        dim=32,
        num_communities=4,
        walk_length=16,
        walks_per_node=2,
        window=4,
        negative_mode="shared",
        shared_negatives=128,
        pallas="never",
        banded="always",
        banded_walk_block=32,
        batch_walks=128,
        batch_edges=1024,
        lr=0.05,
        outer_iters=0,
        pretrain_epochs=8,
        gmm_max_iter=20,
        reg_covar=1e-2,
    )
    t = ComETrainer(g, cfg)
    assert not t._use_walk_kernel()
    assert t._use_banded()
    first = t.o1_epoch()
    losses = [t.o1_epoch() for _ in range(7)]
    assert np.isfinite(first) and losses[-1] < first
    t.fit_gmm()
    assert nmi_score(labels, t.communities()) > 0.5


def test_chunked_pools_match_composed_oracle(rng):
    """[C, KP] pool sub-chunks per block: each chunk's walks train
    against ONLY their own fresh pool — equivalent to running C smaller
    single-pool blocks from the same table state, with one combined
    scatter.  (The stability form: bounded per-application pool mass at
    full positive-pass block size.)"""
    import jax.numpy as jnp

    from come_tpu.losses.sgns_banded import (
        banded_walk_sgns_step_packed,
        pack_tables,
        unpack_tables,
    )

    V, d, KP, Bc, L, W, C = 120, 16, 8, 8, 10, 3, 2
    ei = rng.normal(size=(V, d)).astype(np.float32) * 0.2
    eo = rng.normal(size=(V, d)).astype(np.float32) * 0.2
    walks = rng.integers(0, V, (Bc, L)).astype(np.int32)
    pools = rng.integers(0, V, (1, C, KP)).astype(np.int32)
    lr, negw = 0.05, 5.0 / KP

    combo, loss, npairs = banded_walk_sgns_step_packed(
        pack_tables(jnp.asarray(ei), jnp.asarray(eo)),
        jnp.asarray(walks), jnp.asarray(pools), lr, negw,
        jax.random.key(0), window=W, walk_block=Bc,
        reduced_window=False, mxu_bf16=False,
    )
    ni, no = unpack_tables(combo)

    # composed oracle: C sub-blocks from the SAME start state, updates
    # summed (one scatter application)
    e_in, e_out = ei.copy(), eo.copy()
    total_loss, total_np = 0.0, 0.0
    d_in = np.zeros_like(ei)
    d_out = np.zeros_like(eo)
    wrow = np.full((Bc, L), W, np.int32)
    for c in range(C):
        sl = slice(c * (Bc // C), (c + 1) * (Bc // C))
        ol, onp_, odin, odout = _oracle_block(
            ei, eo, walks[sl], pools[0, c], wrow[sl], negw
        )
        total_loss += ol
        total_np += onp_
        d_in += odin
        d_out += odout
    e_in -= lr * d_in
    e_out -= lr * d_out
    assert float(npairs) == total_np
    np.testing.assert_allclose(float(loss), total_loss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ni), e_in, rtol=1e-3, atol=3e-5)
    np.testing.assert_allclose(np.asarray(no), e_out, rtol=1e-3, atol=3e-5)
