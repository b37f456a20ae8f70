"""Ablate the banded step's per-block costs at large V (TPU).

Times one full macro step (2048 walks x L=80) under component knock-outs so
the bottleneck (gather / banded matmuls / pool matmuls / sort / scatter) is
attributable.  Not a test — a tuning aid.
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from come_tpu.losses.sgns_banded import banded_block_grads
from come_tpu.ops.sparse import scatter_add_rows, scatter_add_rows_sorted

V, d, B, L, W = 500_000, 128, 2048, 80, 10


@functools.partial(jax.jit, static_argnames=("mode", "Bc", "KP"))
def step(emb_in, emb_out, walks, pool, key, mode="full", Bc=256, KP=512):
    G = B // Bc
    walks_g = walks.reshape(G, Bc, L)
    wrows = jax.random.randint(key, (G, Bc, L), 1, W + 1, dtype=jnp.int32)
    lr = jnp.float32(0.0005)

    def block(carry, xs):
        e_in, e_out = carry
        w, wr = xs
        flat = w.reshape(Bc * L)
        phi = jnp.take(e_in, flat, axis=0).reshape(Bc, L, d)
        ctx = jnp.take(e_out, flat, axis=0).reshape(Bc, L, d)
        cneg = jnp.take(e_out, pool[:KP], axis=0)
        if mode == "gather_scatter":
            d_phi, d_ctx = phi * 1e-9, ctx * 1e-9
            d_cneg = cneg * 1e-9
            loss = npairs = jnp.float32(0)
        else:
            loss, npairs, (d_phi, d_ctx, d_cneg) = banded_block_grads(
                phi, ctx, cneg, wr, 5.0 / KP, mxu_bf16=True
            )
        if mode == "no_scatter":
            e_in = e_in + 0.0 * jnp.sum(d_phi)
            e_out = e_out + 0.0 * (jnp.sum(d_ctx) + jnp.sum(d_cneg))
        else:
            sc = (scatter_add_rows if mode == "plain_scatter"
                  else scatter_add_rows_sorted)
            e_in = sc(e_in, flat, d_phi.reshape(Bc * L, d) * (-lr))
            e_out = sc(e_out, flat, d_ctx.reshape(Bc * L, d) * (-lr))
            e_out = sc(e_out, pool[:KP], d_cneg * (-lr))
        return (e_in, e_out), (loss, npairs)

    (emb_in, emb_out), (losses, _) = jax.lax.scan(
        block, (emb_in, emb_out), (walks_g, wrows)
    )
    return emb_in, emb_out, jnp.sum(losses)


def main():
    key = jax.random.key(0)
    emb_in = jax.random.normal(key, (V, d), jnp.float32) * 0.01
    emb_out = jnp.zeros((V, d), jnp.float32)
    walks = jax.random.randint(jax.random.key(1), (B, L), 0, V, jnp.int32)
    pool = jax.random.randint(jax.random.key(2), (2048,), 0, V, jnp.int32)
    pairs = B * L * (W + 1) * 0.9

    for mode in ("full", "plain_scatter", "no_scatter", "gather_scatter"):
        for Bc in (256, 1024):
            for KP in (128, 512):
                if mode != "full" and (Bc, KP) != (256, 512):
                    continue
                a, b, l = step(emb_in, emb_out, walks, pool, key,
                               mode=mode, Bc=Bc, KP=KP)
                float(l)  # host transfer = real sync (axon tunnel)
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    a, b, l = step(emb_in, emb_out, walks, pool, key,
                                   mode=mode, Bc=Bc, KP=KP)
                    float(l)
                    float(a[0, 0])
                    float(b[0, 0])
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                print(json.dumps(dict(
                    mode=mode, Bc=Bc, KP=KP, step_ms=round(dt * 1e3, 1),
                    mpairs_s=round(pairs / dt / 1e6, 1),
                )), flush=True)


if __name__ == "__main__":
    main()
