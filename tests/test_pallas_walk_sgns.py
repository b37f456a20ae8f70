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
    # reference: run the two groups one after the other; pool staged ONCE
    # at the start and applied ONCE at the end, accumulating over groups
    e_in, e_out = emb_in.copy(), emb_out.copy()
    cneg0 = e_out[sneg].copy()
    total_loss = 0.0
    dneg_total = np.zeros((KP, d), np.float32)

    def one_group(e_in, e_out, wk):
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
        return loss, dneg

    l0, dn0 = one_group(e_in, e_out, walks[:8])
    l1, dn1 = one_group(e_in, e_out, walks[8:])
    np.add.at(e_out, sneg, -lr * (dn0 + dn1))
    np.testing.assert_allclose(float(loss), l0 + l1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ni), e_in, rtol=1e-3, atol=3e-5)
    np.testing.assert_allclose(np.asarray(no), e_out, rtol=1e-3, atol=3e-5)
