"""In-jit ablation of the banded step at V=500k: 100-block scans per mode.

Each mode is ONE executable (dispatch overhead through the axon tunnel is
~100ms/call, so per-call timing is useless — the scan amortizes it), synced
by a host transfer of a value that depends on the carried tables.
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

V, d, L, W, KP, NB = 500_000, 128, 80, 10, 512, 100


def scatter_sorted_v2(table, idx, updates):
    """Sorted + deduped + XLA fast-path flags (drop-mode OOB masking)."""
    V = table.shape[0]
    order = jnp.argsort(idx)
    sidx = idx[order]
    supd = updates[order]
    head = jnp.concatenate([jnp.ones(1, bool), sidx[1:] != sidx[:-1]])
    seg = jnp.cumsum(head) - 1
    n = idx.shape[0]
    summed = jax.ops.segment_sum(supd, seg, num_segments=n)
    run_rows = jax.ops.segment_max(sidx, seg, num_segments=n)
    run_rows = jnp.where(run_rows >= 0, run_rows, V)  # OOB -> dropped
    return table.at[run_rows].add(
        summed, indices_are_sorted=True, unique_indices=True, mode="drop"
    )


def scatter_plain(table, idx, updates):
    return table.at[idx].add(updates)


def scatter_sorted_v1(table, idx, updates):
    from come_tpu.ops.sparse import scatter_add_rows_sorted

    return scatter_add_rows_sorted(table, idx, updates)


SCATTERS = dict(plain=scatter_plain, v1=scatter_sorted_v1,
                v2=scatter_sorted_v2)


@functools.partial(jax.jit, static_argnames=("mode", "Bc"),
                   donate_argnums=(0, 1))
def run(emb_in, emb_out, walks, pool, key, mode="full_v2", Bc=1024):
    walks_g = walks.reshape(NB, Bc, L)
    wrows = jax.random.randint(key, (NB, Bc, L), 1, W + 1, dtype=jnp.int32)
    lr = jnp.float32(0.0005)
    parts = mode.split("_")

    def block(carry, xs):
        e_in, e_out = carry
        w, wr = xs
        flat = w.reshape(Bc * L)
        phi = jnp.take(e_in, flat, axis=0).reshape(Bc, L, d)
        ctx = jnp.take(e_out, flat, axis=0).reshape(Bc, L, d)
        cneg = jnp.take(e_out, pool, axis=0)
        if parts[0] == "gatheronly":
            d_phi, d_ctx, d_cneg = phi, ctx, cneg
            loss = jnp.float32(0)
        else:
            loss, _, (d_phi, d_ctx, d_cneg) = banded_block_grads(
                phi, ctx, cneg, wr, 5.0 / KP, mxu_bf16=True
            )
        if len(parts) > 1 and parts[1] in SCATTERS:
            sc = SCATTERS[parts[1]]
            e_in = sc(e_in, flat, d_phi.reshape(Bc * L, d) * (-lr))
            e_out = sc(e_out, flat, d_ctx.reshape(Bc * L, d) * (-lr))
            e_out = sc(e_out, pool, d_cneg * (-lr))
        else:  # noscatter
            e_in = e_in * (1.0 - 1e-12 * jnp.sum(d_phi))
            e_out = e_out * (1.0 - 1e-12 * (jnp.sum(d_ctx) + jnp.sum(d_cneg)))
        return (e_in, e_out), loss

    (emb_in, emb_out), losses = jax.lax.scan(
        block, (emb_in, emb_out), (walks_g, wrows)
    )
    return emb_in, emb_out, jnp.sum(losses)


def main():
    Bc = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    pairs = NB * Bc * L * (W + 1) * 0.9
    modes = ["full_v2", "full_v1", "full_plain", "full_noscatter",
             "gatheronly_v2", "gatheronly_noscatter"]
    for mode in modes:
        ein = jax.random.normal(jax.random.key(0), (V, d), jnp.float32) * .01
        eout = jnp.zeros((V, d), jnp.float32)
        walks = jax.random.randint(
            jax.random.key(1), (NB * Bc, L), 0, V, jnp.int32)
        pool = jax.random.randint(jax.random.key(2), (KP,), 0, V, jnp.int32)
        key = jax.random.key(3)
        ein, eout, l = run(ein, eout, walks, pool, key, mode=mode, Bc=Bc)
        float(l), float(ein[0, 0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            ein, eout, l = run(ein, eout, walks, pool, key, mode=mode, Bc=Bc)
            float(l), float(ein[0, 0]), float(eout[0, 0])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(json.dumps(dict(
            mode=mode, Bc=Bc, ms_per_block=round(dt * 1e3 / NB, 2),
            mpairs_s=round(pairs / dt / 1e6, 1),
        )), flush=True)


if __name__ == "__main__":
    main()
