"""Per-section cost probe for the star O2 kernel (run on the real chip).

Builds parametrized variants of ops/pallas_star_sgns.py's kernel with
individual sections disabled (gather / positive+negative math / scatter /
pool) and times each on the BlogCatalog-scale layout, attributing group
time to sections by subtraction.  The variants are NOT semantically
meaningful — they exist only to locate the cost center (VERDICT r4 next-
round item 1: "measured, not argued").

Usage: python scripts/probe_star.py
"""

from __future__ import annotations

import functools
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NWL = 1024
BLK = 128


def _kern(
    seed_ref, slots_ref, metac_ref, sneg_ref, scal_ref, emb_hbm,
    emb_out, stats_ref, phi_ref, dphi_ref, cneg_ref, dneg_ref, acc_ref,
    dma_sem,
    KP, R, GATHER, MATH, NEG, SCATTER, POOL, UNROLL,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    lr = scal_ref[0, 0]
    negw = scal_ref[0, 1]

    @pl.when(i == 0)
    def _init():
        acc_ref[0, 0] = 0.0
        acc_ref[0, 1] = 0.0
        cp = pltpu.make_async_copy(emb_hbm, emb_out, dma_sem)
        cp.start()
        cp.wait()

    if POOL:
        @pl.when(i % R == 0)
        def _stage_pool():
            def g(k, _):
                cneg_ref[k, :] = emb_out[sneg_ref[k], :]
                return 0

            jax.lax.fori_loop(0, KP, g, 0)
            dneg_ref[:, :] = jnp.zeros_like(dneg_ref)

    U = UNROLL
    if GATHER:
        def gather(tu, _):
            base = tu * U
            for j in range(U):
                t = base + j
                phi_ref[t, :] = emb_out[slots_ref[t], :]
            return 0

        jax.lax.fori_loop(0, NWL // U, gather, 0)

    if MATH:
        cneg_m = cneg_ref[:, :].astype(jnp.bfloat16)
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
        ).astype(jnp.float32)
        loss = 0.0
        npairs = 0.0
        for b in range(NWL // BLK):
            phi_bm = phi_ref[pl.ds(b * BLK, BLK), :].astype(jnp.bfloat16)
            mc = metac_ref[pl.ds(b, 1), :]
            mr = jax.lax.dot_general(
                eye, mc.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            m = (
                ((mr >> 1) == (mc >> 1)) & (((mr ^ mc) & 1) == 1)
            ).astype(jnp.float32)
            s = jax.lax.dot_general(
                phi_bm, phi_bm,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            g = (jax.nn.sigmoid(s) - 1.0) * m
            loss += -jnp.sum(m * jax.nn.log_sigmoid(s))
            n_t = jnp.sum(m, axis=1, keepdims=True)
            npairs += jnp.sum(n_t)
            g_m = g.astype(jnp.bfloat16)
            dpos = jnp.dot(g_m, phi_bm, preferred_element_type=jnp.float32)
            dpos += jax.lax.dot_general(
                g_m, phi_bm,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if NEG:
                sn = jax.lax.dot_general(
                    phi_bm, cneg_m,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                gn = jax.nn.sigmoid(sn) * (negw * n_t)
                loss += -negw * jnp.sum(n_t * jax.nn.log_sigmoid(-sn))
                gn_m = gn.astype(jnp.bfloat16)
                dpos += jnp.dot(
                    gn_m, cneg_m, preferred_element_type=jnp.float32
                )
                dneg_ref[:, :] += jax.lax.dot_general(
                    gn_m, phi_bm,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dphi_ref[pl.ds(b * BLK, BLK), :] = dpos * (-lr)
        acc_ref[0, 0] += loss
        acc_ref[0, 1] += npairs

    if SCATTER:
        def scatter(tu, _):
            base = tu * U
            for j in range(U):
                t = base + j
                v = slots_ref[t]
                emb_out[v, :] = emb_out[v, :] + dphi_ref[t, :]
            return 0

        jax.lax.fori_loop(0, NWL // U, scatter, 0)

    if POOL:
        @pl.when((i % R == R - 1) | (i == n - 1))
        def _apply_pool():
            def s(k, _):
                nk = sneg_ref[k]
                emb_out[nk, :] = emb_out[nk, :] - lr * dneg_ref[k, :]
                return 0

            jax.lax.fori_loop(0, KP, s, 0)

    @pl.when(i == n - 1)
    def _finish():
        stats_ref[0, 0] = acc_ref[0, 0]
        stats_ref[0, 1] = acc_ref[0, 1]


@functools.partial(
    jax.jit,
    static_argnames=(
        "pool_refresh", "gather", "math", "neg", "scatter", "pool",
        "unroll",
    ),
)
def step(
    emb, slots, meta, sneg, lr, negw,
    pool_refresh=8, gather=True, math=True, neg=True, scatter=True,
    pool=True, unroll=32,
):
    T = slots.shape[0]
    KP = sneg.shape[-1]
    V, d = emb.shape
    G = T // NWL
    R = pool_refresh
    n_pools = -(-G // R)
    sneg_g = jnp.broadcast_to(sneg, (n_pools, KP))
    KPp = -(-KP // 1024) * 1024
    if KPp != KP:
        sneg_g = jnp.pad(sneg_g, ((0, 0), (0, KPp - KP)))
    scal = jnp.stack(
        [jnp.asarray(lr, jnp.float32), jnp.asarray(negw, jnp.float32)]
    ).reshape(1, 2)
    kernel = functools.partial(
        _kern, KP=KP, R=R, GATHER=gather, MATH=math, NEG=neg,
        SCATTER=scatter, POOL=pool, UNROLL=unroll,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((NWL,), lambda i, _s: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NWL // BLK, BLK), lambda i, _s: (i, 0)),
            pl.BlockSpec((KPp,), lambda i, _s: (i // R,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i, _s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NWL, d), jnp.float32),
            pltpu.VMEM((NWL, d), jnp.float32),
            pltpu.VMEM((KP, d), jnp.float32),
            pltpu.VMEM((KP, d), jnp.float32),
            pltpu.SMEM((1, 2), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    new_emb, stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((V, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ],
        input_output_aliases={5: 0},
        interpret=False,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=110 * 1024 * 1024
        ),
    )(
        jnp.asarray(0, jnp.int32).reshape(1),
        slots.reshape(G * NWL),
        meta.reshape(G * (NWL // BLK), BLK),
        sneg_g.astype(jnp.int32).reshape(n_pools * KPp),
        scal,
        emb,
    )
    return new_emb, stats


def main():
    from come_tpu.graphs import get_dataset
    from come_tpu.sampling.stars import build_star_layout

    ds = get_dataset("blogcatalog")
    u, v = ds.graph.edges_undirected()
    slots_np, meta_np = build_star_layout(u, v, ds.graph.num_nodes)
    T = slots_np.shape[0] // NWL * NWL
    slots = jnp.asarray(slots_np[:T], jnp.int32)
    meta = jnp.asarray(meta_np[:T], jnp.int32)
    G = T // NWL
    V, d, KP = ds.graph.num_nodes, 128, 512
    rng = np.random.default_rng(0)
    emb0 = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32) * 0.1)
    sneg = jnp.asarray(rng.integers(0, V, KP).astype(np.int32))

    def t_of(**kw):
        e = emb0
        e, st = step(e, slots, meta, sneg, 0.01, 5 / KP, **kw)
        float(e[0, 0])  # compile+warm; scalar read = real D2H sync
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            e2 = e
            for _ in range(4):  # chain 4 steps, one sync (tunnel RTT)
                e2, st = step(e2, slots, meta, sneg, 0.01, 5 / KP, **kw)
            float(e2[0, 0])
            samples.append((time.perf_counter() - t0) / (4 * G) * 1e6)
        return statistics.median(samples)

    full = t_of()
    print(f"groups={G}  slots={T}  (us/group, median of 3)")
    print(f"full                 {full:7.1f}")
    for name, kw in [
        ("no scatter", dict(scatter=False)),
        ("no gather", dict(gather=False)),
        ("no math (g+s only)", dict(math=False)),
        ("no neg pass", dict(neg=False)),
        ("no pool", dict(pool=False)),
        ("math only", dict(gather=False, scatter=False, pool=False)),
        ("gather only", dict(math=False, scatter=False, pool=False)),
        ("scatter only", dict(math=False, gather=False, pool=False)),
        ("empty", dict(math=False, gather=False, scatter=False,
                       pool=False)),
    ]:
        print(f"{name:20s} {t_of(**kw):7.1f}")
    for u_ in (8, 16, 64, 128):
        print(f"full unroll={u_:<3d}      {t_of(unroll=u_):7.1f}")


if __name__ == "__main__":
    main()
