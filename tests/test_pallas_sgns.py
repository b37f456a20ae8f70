"""Fused Pallas SGNS kernel vs a numpy reference of its tile semantics.

Runs in interpreter mode on CPU (the TPU compile path is exercised by
bench/TPU runs); semantics: TP-pair tiles applied sequentially, shared
negative pool staged at step 0 with its gradient applied once at the end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from come_tpu.ops.pallas_sgns import fused_sgns_step


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def ref_fused(emb_in, emb_out, c, x, sneg, m, lr, negw, TP):
    emb_in = emb_in.copy()
    emb_out = emb_out.copy()
    P = len(c)
    n_tiles = -(-P // TP)
    pad = n_tiles * TP - P
    c = np.pad(c, (0, pad))
    x = np.pad(x, (0, pad))
    m = np.pad(m, (0, pad))
    cneg = emb_out[sneg].copy()  # staged once
    dneg = np.zeros_like(cneg)
    loss = 0.0
    for i in range(n_tiles):
        sl = slice(i * TP, (i + 1) * TP)
        ct, xt, mt = c[sl], x[sl], m[sl][:, None]
        phi = emb_in[ct].copy()
        cpos = emb_out[xt].copy()
        spos = np.sum(phi * cpos, axis=1, keepdims=True)
        sn = phi @ cneg.T
        gpos = (_sig(spos) - 1.0) * mt
        gneg = _sig(sn) * (negw * mt)
        loss += -(
            np.sum(mt * np.log(np.maximum(_sig(spos), 1e-30)))
            + negw * np.sum(mt * np.log(np.maximum(_sig(-sn), 1e-30)))
        )
        d_phi = gpos * cpos + gneg @ cneg
        d_cpos = gpos * phi
        dneg += gneg.T @ phi
        for t in range(TP):  # sequential RMW, duplicates exact
            emb_in[ct[t]] -= lr * d_phi[t]
            emb_out[xt[t]] -= lr * d_cpos[t]
    np.add.at(emb_out, sneg, -lr * dneg)
    return emb_in, emb_out, loss


@pytest.mark.parametrize("P,TP", [(300, 128), (256, 128), (64, 64)])
def test_fused_kernel_matches_reference(rng, P, TP):
    V, d, KP = 48, 128, 16
    emb_in = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    emb_out = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    c = rng.integers(0, V, P).astype(np.int32)
    x = rng.integers(0, V, P).astype(np.int32)
    sneg = rng.integers(0, V, KP).astype(np.int32)
    m = (rng.random(P) < 0.9).astype(np.float32)
    lr, negw = 0.05, 5.0 / KP

    ni, no, loss = fused_sgns_step(
        jnp.asarray(emb_in), jnp.asarray(emb_out), jnp.asarray(c),
        jnp.asarray(x), jnp.asarray(sneg), jnp.asarray(m), lr, negw,
        tile_pairs=TP, interpret=True,
    )
    ri, ro, rloss = ref_fused(emb_in, emb_out, c, x, sneg, m, lr, negw, TP)
    np.testing.assert_allclose(float(loss), rloss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ni), ri, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(no), ro, rtol=1e-4, atol=1e-5)


def ref_fused_tied(emb, c, x, sneg, m, lr, negw, TP):
    emb = emb.copy()
    P = len(c)
    n_tiles = -(-P // TP)
    pad = n_tiles * TP - P
    c = np.pad(c, (0, pad))
    x = np.pad(x, (0, pad))
    m = np.pad(m, (0, pad))
    cneg = emb[sneg].copy()
    dneg = np.zeros_like(cneg)
    loss = 0.0
    for i in range(n_tiles):
        sl = slice(i * TP, (i + 1) * TP)
        ct, xt, mt = c[sl], x[sl], m[sl][:, None]
        phi = emb[ct].copy()
        cpos = emb[xt].copy()
        spos = np.sum(phi * cpos, axis=1, keepdims=True)
        sn = phi @ cneg.T
        gpos = (_sig(spos) - 1.0) * mt
        gneg = _sig(sn) * (negw * mt)
        loss += -(
            np.sum(mt * np.log(np.maximum(_sig(spos), 1e-30)))
            + negw * np.sum(mt * np.log(np.maximum(_sig(-sn), 1e-30)))
        )
        d_phi = gpos * cpos + gneg @ cneg
        d_cpos = gpos * phi
        dneg += gneg.T @ phi
        for t in range(TP):  # c-row then x-row, sequential
            emb[ct[t]] -= lr * d_phi[t]
            emb[xt[t]] -= lr * d_cpos[t]
    np.add.at(emb, sneg, -lr * dneg)
    return emb, loss


@pytest.mark.parametrize("P,TP", [(300, 128), (128, 64)])
def test_fused_tied_kernel_matches_reference(rng, P, TP):
    from come_tpu.ops.pallas_sgns import fused_sgns_step_tied

    V, d, KP = 40, 128, 16
    emb = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    c = rng.integers(0, V, P).astype(np.int32)
    x = rng.integers(0, V, P).astype(np.int32)
    sneg = rng.integers(0, V, KP).astype(np.int32)
    m = (rng.random(P) < 0.9).astype(np.float32)
    lr, negw = 0.05, 5.0 / KP
    ne, loss = fused_sgns_step_tied(
        jnp.asarray(emb), jnp.asarray(c), jnp.asarray(x), jnp.asarray(sneg),
        jnp.asarray(m), lr, negw, tile_pairs=TP, interpret=True,
    )
    re_, rloss = ref_fused_tied(emb, c, x, sneg, m, lr, negw, TP)
    np.testing.assert_allclose(float(loss), rloss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ne), re_, rtol=1e-4, atol=1e-5)


def test_fused_kernel_mask_zero_is_noop(rng):
    V, d, P, KP = 32, 128, 128, 8
    emb_in = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    emb_out = rng.normal(size=(V, d)).astype(np.float32) * 0.1
    c = rng.integers(0, V, P).astype(np.int32)
    x = rng.integers(0, V, P).astype(np.int32)
    sneg = rng.integers(0, V, KP).astype(np.int32)
    m = np.zeros(P, np.float32)
    ni, no, loss = fused_sgns_step(
        jnp.asarray(emb_in), jnp.asarray(emb_out), jnp.asarray(c),
        jnp.asarray(x), jnp.asarray(sneg), jnp.asarray(m), 0.05, 0.5,
        tile_pairs=64, interpret=True,
    )
    # loss is (raw constant) - (analytic correction): zero up to f32 eps
    assert abs(float(loss)) < 1e-2
    np.testing.assert_array_equal(np.asarray(ni), emb_in)
    np.testing.assert_array_equal(np.asarray(no), emb_out)
