"""Walk-banded fused kernel vs a numpy reference of its group semantics.

Interpreter mode (CPU) requires the deterministic-window path (the kernel
PRNG has no CPU lowering); hardware runs use reduced_window=True.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from come_tpu.ops.pallas_walk_sgns import NWL, fused_walk_sgns_step


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def ref_walk_group(emb_in, emb_out, walks, sneg, lr, negw, W, Lp=128):
    """One group (B walks <= NWL/Lp) applied synchronously; pool staged at
    start and applied at the end — mirrors the kernel's structure."""
    emb_in = emb_in.copy()
    emb_out = emb_out.copy()
    B, L = walks.shape
    S = B * Lp
    slots = np.zeros((B, Lp), np.int32)
    slots[:, :L] = walks
    slots = slots.reshape(S)
    phi = emb_in[slots].copy()
    ctx = emb_out[slots].copy()
    cneg = emb_out[sneg].copy()

    prow = np.arange(S) % Lp
    brow = np.arange(S) // Lp
    m = (
        (brow[:, None] == brow[None, :])
        & (prow[None, :] - prow[:, None] != 0)
        & (np.abs(prow[None, :] - prow[:, None]) <= W)
        & (prow[:, None] < L)
        & (prow[None, :] < L)
    ).astype(np.float32)

    s = phi @ ctx.T
    g = (_sig(s) - 1.0) * m
    loss = -np.sum(m * np.log(np.maximum(_sig(s), 1e-30)))
    n_t = m.sum(1, keepdims=True)
    dphi = g @ ctx
    dctx = g.T @ phi

    sn = phi @ cneg.T
    gneg = _sig(sn) * (negw * n_t)
    loss += -negw * np.sum(n_t * np.log(np.maximum(_sig(-sn), 1e-30)))
    dphi += gneg @ cneg
    dneg = gneg.T @ phi

    for t in range(S):  # sequential RMW like the kernel's scatter loop
        emb_in[slots[t]] -= lr * dphi[t]
        emb_out[slots[t]] -= lr * dctx[t]
    np.add.at(emb_out, sneg, -lr * dneg)
    return emb_in, emb_out, loss, float(n_t.sum())


@pytest.mark.parametrize("W,L,B", [(4, 40, 8), (2, 20, 8)])
def test_walk_kernel_matches_reference(rng, W, L, B):
    V, d, KP = 60, 128, 16
    emb_in = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    emb_out = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    walks = rng.integers(0, V, (B, L)).astype(np.int32)
    sneg = rng.integers(0, V, KP).astype(np.int32)
    lr, negw = 0.05, 5.0 / KP

    ni, no, loss, npairs = fused_walk_sgns_step(
        jnp.asarray(emb_in), jnp.asarray(emb_out), jnp.asarray(walks),
        jnp.asarray(sneg), lr, negw, seed=0, window=W,
        interpret=True, reduced_window=False,
    )
    ri, ro, rloss, rn = ref_walk_group(
        emb_in, emb_out, walks, sneg, lr, negw, W
    )
    assert float(npairs) == rn
    np.testing.assert_allclose(float(loss), rloss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ni), ri, rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(no), ro, rtol=1e-3, atol=2e-5)


def test_walk_kernel_multi_group_sequential(rng):
    """Two groups: group 1 must see group 0's updates (sequential grid)."""
    V, d, KP = 50, 128, 8
    emb_in = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    emb_out = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    walks = rng.integers(0, V, (16, 24)).astype(np.int32)  # 2 groups
    sneg = rng.integers(0, V, KP).astype(np.int32)
    lr, negw = 0.05, 5.0 / KP

    ni, no, loss, npairs = fused_walk_sgns_step(
        jnp.asarray(emb_in), jnp.asarray(emb_out), jnp.asarray(walks),
        jnp.asarray(sneg), lr, negw, seed=0, window=3,
        interpret=True, reduced_window=False,
    )
    # reference: run the two groups one after the other; each group stages
    # the pool FRESH from the current table and applies its pool gradient
    # at its own group boundary (the kernel's per-group semantics)
    e_in, e_out = emb_in.copy(), emb_out.copy()

    def one_group(e_in, e_out, wk):
        cneg0 = e_out[sneg].copy()
        B, L = wk.shape
        Lp = 128
        S = B * Lp
        slots = np.zeros((B, Lp), np.int32)
        slots[:, :L] = wk
        slots = slots.reshape(S)
        phi = e_in[slots].copy()
        ctx = e_out[slots].copy()
        prow = np.arange(S) % Lp
        brow = np.arange(S) // Lp
        m = (
            (brow[:, None] == brow[None, :])
            & (prow[None, :] - prow[:, None] != 0)
            & (np.abs(prow[None, :] - prow[:, None]) <= 3)
            & (prow[:, None] < L)
            & (prow[None, :] < L)
        ).astype(np.float32)
        s = phi @ ctx.T
        g = (_sig(s) - 1.0) * m
        loss = -np.sum(m * np.log(np.maximum(_sig(s), 1e-30)))
        n_t = m.sum(1, keepdims=True)
        dphi = g @ ctx
        dctx = g.T @ phi
        sn = phi @ cneg0.T
        gneg = _sig(sn) * (negw * n_t)
        loss += -negw * np.sum(n_t * np.log(np.maximum(_sig(-sn), 1e-30)))
        dphi += gneg @ cneg0
        dneg = gneg.T @ phi
        for t in range(S):
            e_in[slots[t]] -= lr * dphi[t]
            e_out[slots[t]] -= lr * dctx[t]
        np.add.at(e_out, sneg, -lr * dneg)
        return loss

    l0 = one_group(e_in, e_out, walks[:8])
    l1 = one_group(e_in, e_out, walks[8:])
    np.testing.assert_allclose(float(loss), l0 + l1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ni), e_in, rtol=1e-3, atol=3e-5)
    np.testing.assert_allclose(np.asarray(no), e_out, rtol=1e-3, atol=3e-5)


def test_walk_kernel_per_group_pools(rng):
    """[G, KP] pools: each group must use (and update through) its own."""
    V, d, KP = 50, 128, 8
    emb_in = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    emb_out = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    walks = rng.integers(0, V, (16, 24)).astype(np.int32)  # 2 groups
    sneg = rng.integers(0, V, (2, KP)).astype(np.int32)
    lr, negw = 0.05, 5.0 / KP

    ni, no, loss, npairs = fused_walk_sgns_step(
        jnp.asarray(emb_in), jnp.asarray(emb_out), jnp.asarray(walks),
        jnp.asarray(sneg), lr, negw, seed=0, window=3,
        interpret=True, reduced_window=False,
    )
    e_in, e_out = emb_in.copy(), emb_out.copy()
    l0 = 0.0
    for gi in range(2):
        ei, eo, lg, _ = ref_walk_group(
            e_in, e_out, walks[8 * gi : 8 * gi + 8], sneg[gi], lr, negw, 3
        )
        e_in, e_out, l0 = ei, eo, l0 + lg
    np.testing.assert_allclose(float(loss), l0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ni), e_in, rtol=1e-3, atol=3e-5)
    np.testing.assert_allclose(np.asarray(no), e_out, rtol=1e-3, atol=3e-5)


def test_walk_kernel_bf16_close_to_f32(rng):
    """bf16 MXU scoring: same semantics, looser numerics."""
    V, d, KP = 60, 128, 16
    emb_in = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    emb_out = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    walks = rng.integers(0, V, (8, 40)).astype(np.int32)
    sneg = rng.integers(0, V, KP).astype(np.int32)
    lr, negw = 0.05, 5.0 / KP

    f32 = fused_walk_sgns_step(
        jnp.asarray(emb_in), jnp.asarray(emb_out), jnp.asarray(walks),
        jnp.asarray(sneg), lr, negw, seed=0, window=4,
        interpret=True, reduced_window=False, mxu_bf16=False,
    )
    b16 = fused_walk_sgns_step(
        jnp.asarray(emb_in), jnp.asarray(emb_out), jnp.asarray(walks),
        jnp.asarray(sneg), lr, negw, seed=0, window=4,
        interpret=True, reduced_window=False, mxu_bf16=True,
    )
    # must actually differ (flag reaches the kernel) ...
    assert float(jnp.abs(f32[0] - b16[0]).max()) > 0.0
    # ... but only at bf16 rounding scale
    np.testing.assert_allclose(
        np.asarray(b16[0]), np.asarray(f32[0]), rtol=0.05, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(b16[1]), np.asarray(f32[1]), rtol=0.05, atol=2e-3
    )


def test_walk_kernel_pool_refresh_blocks(rng):
    """R=2: pool staged per 2-group block, gradient applied at block end."""
    V, d, KP = 50, 128, 8
    emb_in = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    emb_out = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    walks = rng.integers(0, V, (32, 24)).astype(np.int32)  # 4 groups
    sneg = rng.integers(0, V, (2, KP)).astype(np.int32)  # 2 pools
    lr, negw = 0.05, 5.0 / KP
    W, Lp = 3, 128

    ni, no, loss, npairs = fused_walk_sgns_step(
        jnp.asarray(emb_in), jnp.asarray(emb_out), jnp.asarray(walks),
        jnp.asarray(sneg), lr, negw, seed=0, window=W,
        interpret=True, reduced_window=False, pool_refresh=2,
    )

    def group_grads(e_in, e_out, wk, cneg0):
        B, L = wk.shape
        S = B * Lp
        slots = np.zeros((B, Lp), np.int32)
        slots[:, :L] = wk
        slots = slots.reshape(S)
        phi = e_in[slots].copy()
        ctx = e_out[slots].copy()
        prow = np.arange(S) % Lp
        brow = np.arange(S) // Lp
        m = (
            (brow[:, None] == brow[None, :])
            & (prow[None, :] - prow[:, None] != 0)
            & (np.abs(prow[None, :] - prow[:, None]) <= W)
            & (prow[:, None] < L)
            & (prow[None, :] < L)
        ).astype(np.float32)
        s = phi @ ctx.T
        g = (_sig(s) - 1.0) * m
        loss = -np.sum(m * np.log(np.maximum(_sig(s), 1e-30)))
        n_t = m.sum(1, keepdims=True)
        dphi = g @ ctx
        dctx = g.T @ phi
        sn = phi @ cneg0.T
        gneg = _sig(sn) * (negw * n_t)
        loss += -negw * np.sum(n_t * np.log(np.maximum(_sig(-sn), 1e-30)))
        dphi += gneg @ cneg0
        dneg = gneg.T @ phi
        for t in range(S):
            e_in[slots[t]] -= lr * dphi[t]
            e_out[slots[t]] -= lr * dctx[t]
        return loss, dneg

    e_in, e_out = emb_in.copy(), emb_out.copy()
    total = 0.0
    for blk in range(2):
        cneg0 = e_out[sneg[blk]].copy()  # staged once per block
        dneg_acc = np.zeros((KP, d), np.float32)
        for gi in range(2):
            wk = walks[8 * (2 * blk + gi) : 8 * (2 * blk + gi) + 8]
            lg, dn = group_grads(e_in, e_out, wk, cneg0)
            total += lg
            dneg_acc += dn
        np.add.at(e_out, sneg[blk], -lr * dneg_acc)  # applied at block end
    np.testing.assert_allclose(float(loss), total, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ni), e_in, rtol=1e-3, atol=3e-5)
    np.testing.assert_allclose(np.asarray(no), e_out, rtol=1e-3, atol=3e-5)


def test_walk_kernel_bf16_tables_rtn(rng):
    """bf16-resident tables (interpret: round-to-nearest writes) track the
    f32 kernel to bf16 resolution."""
    V, d, KP = 60, 128, 16
    emb_in = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    emb_out = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    walks = rng.integers(0, V, (8, 40)).astype(np.int32)
    sneg = rng.integers(0, V, KP).astype(np.int32)
    lr, negw = 0.05, 5.0 / KP

    f32 = fused_walk_sgns_step(
        jnp.asarray(emb_in), jnp.asarray(emb_out), jnp.asarray(walks),
        jnp.asarray(sneg), lr, negw, seed=0, window=4,
        interpret=True, reduced_window=False,
    )
    b16 = fused_walk_sgns_step(
        jnp.asarray(emb_in, jnp.bfloat16), jnp.asarray(emb_out, jnp.bfloat16),
        jnp.asarray(walks), jnp.asarray(sneg), lr, negw, seed=0, window=4,
        interpret=True, reduced_window=False,
    )
    assert b16[0].dtype == jnp.bfloat16 and b16[1].dtype == jnp.bfloat16
    # interpret path truncates instead of rounding: allow ~2 bf16 ulps
    np.testing.assert_allclose(
        np.asarray(b16[0], np.float32), np.asarray(f32[0]),
        rtol=0.06, atol=1.6e-2,
    )
    np.testing.assert_allclose(
        np.asarray(b16[1], np.float32), np.asarray(f32[1]),
        rtol=0.06, atol=1.6e-2,
    )
    np.testing.assert_allclose(float(b16[2]), float(f32[2]), rtol=0.02)


# ---- in-kernel walk generation (gen mode) ----


def _np_walks_from_bits(indptr, indices, starts, bits, L, Lp=128):
    """Reproduce the kernel's walk generation in numpy (same f32 draw
    arithmetic, same bit usage) — the oracle for gen-mode parity."""
    G = bits.shape[0]
    NW = bits.shape[1] // Lp
    walks = np.zeros((G * NW, L), np.int32)
    inv24 = np.float32(1.0 / (1 << 24))
    for g in range(G):
        for j in range(NW):
            v = int(starts[g * NW + j])
            walks[g * NW + j, 0] = v
            for t in range(1, L):
                b = int(bits[g, j * Lp + t]) & 0xFFFFFFFF
                lo, hi = int(indptr[v]), int(indptr[v + 1])
                deg = hi - lo
                if deg > 0:
                    u = np.float32((b >> 8) & 0xFFFFFF) * inv24
                    r = min(int(np.float32(u * np.float32(deg))), deg - 1)
                    v = int(indices[lo + r])
                walks[g * NW + j, t] = v
    return walks


def test_gen_mode_matches_pregenerated_walks():
    """fused_walk_sgns_gen_step (in-kernel walks from VMEM CSR, input bit
    matrix) must produce BIT-identical tables/stats to the normal kernel
    run on the same walks reproduced in numpy from the same bits."""
    from come_tpu.graphs import sbm_graph
    from come_tpu.ops.pallas_walk_sgns import (
        NWL,
        fused_walk_sgns_gen_step,
        fused_walk_sgns_step,
        pack_csr_gen,
    )

    g, _ = sbm_graph(300, 3, p_in=0.2, p_out=0.02, seed=1)
    V, d, L, W, KP = 300, 128, 20, 4, 32
    rng = np.random.default_rng(0)
    ei = jnp.asarray((rng.normal(size=(V, d)) * 0.3).astype(np.float32))
    eo = jnp.asarray((rng.normal(size=(V, d)) * 0.3).astype(np.float32))
    NW = NWL // 128
    G = 2
    starts = rng.integers(0, V, G * NW).astype(np.int32)
    bits = rng.integers(0, 2**32, (G, NWL), dtype=np.uint32)
    pool = rng.integers(0, V, (G, KP)).astype(np.int32)
    indptr1d, deg1d, indices2d = pack_csr_gen(g.indptr, g.indices)

    gi, go, gloss, gnp_ = fused_walk_sgns_gen_step(
        ei, eo, jnp.asarray(starts), jnp.asarray(bits),
        jnp.asarray(indptr1d), jnp.asarray(deg1d),
        jnp.asarray(indices2d), jnp.asarray(pool),
        0.025, 5 / KP, 0, walk_length=L, window=W, interpret=True,
        reduced_window=False,
    )

    walks = _np_walks_from_bits(g.indptr, g.indices, starts, bits, L)
    ni, no, nloss, nnp_ = fused_walk_sgns_step(
        ei, eo, jnp.asarray(walks), jnp.asarray(pool), 0.025, 5 / KP, 0,
        window=W, interpret=True, reduced_window=False,
    )
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ni))
    np.testing.assert_array_equal(np.asarray(go), np.asarray(no))
    assert float(gloss) == float(nloss)
    assert float(gnp_) == float(nnp_)
    # the walks are real graph walks (every hop is an edge)
    adj = {v: set(g.neighbors(v).tolist()) for v in range(V)}
    for b in range(walks.shape[0]):
        for t in range(L - 1):
            assert walks[b, t + 1] in adj[walks[b, t]]
