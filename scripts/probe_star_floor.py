"""Isolate the per-group FIXED cost of the star/walk kernel grid.

probe_star.py showed an empty kernel body (no gather/math/scatter) still
costs ~25us per grid step — the floor, not the work, dominates.  This
probe builds minimal pallas_call variants adding one input stream at a
time to find which pipeline element carries the floor.

Usage: python scripts/probe_star_floor.py
"""

from __future__ import annotations

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
G = 338
V, d = 10312, 128


def timeit(fn, *args):
    out = jax.jit(fn)(*args)
    s = out[0] if isinstance(out, (tuple, list)) else out
    float(np.asarray(s).ravel()[0])
    samples = []
    f = jax.jit(fn)
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            out = f(*args)
        s = out[0] if isinstance(out, (tuple, list)) else out
        float(np.asarray(s).ravel()[0])
        samples.append((time.perf_counter() - t0) / (4 * G) * 1e6)
    return statistics.median(samples)


def main():
    rng = np.random.default_rng(0)
    slots = jnp.asarray(
        rng.integers(0, V, G * NWL).astype(np.int32)
    )
    meta = jnp.asarray(
        rng.integers(0, 128, (G * 8, 128)).astype(np.int32)
    )
    emb = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32))

    # --- 1: bare grid, one SMEM output, nothing else
    def k1(stats_ref):
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            stats_ref[0, 0] = 1.0

    def f1():
        return pl.pallas_call(
            k1,
            grid=(G,),
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )()

    print(f"bare grid                      {timeit(f1):7.2f} us/group")

    # --- 2: + per-group SMEM slots block
    def k2(slots_ref, stats_ref):
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            stats_ref[0, 0] = jnp.float32(slots_ref[0])

    def f2(s):
        return pl.pallas_call(
            k2,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((NWL,), lambda i: (i,),
                             memory_space=pltpu.SMEM)
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(s)

    print(f"+ SMEM slots [1024]/group      {timeit(f2, slots):7.2f}")

    # --- 2b: slots as VMEM [8,128] blocks instead
    def k2b(slots_ref, stats_ref):
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            stats_ref[0, 0] = jnp.float32(slots_ref[0, 0])

    def f2b(s):
        return pl.pallas_call(
            k2b,
            grid=(G,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(s.reshape(G * 8, 128))

    print(f"+ VMEM slots [8,128]/group     {timeit(f2b, slots):7.2f}")

    # --- 3: SMEM slots + SMEM sneg + scal (the star kernel's SMEM set)
    sneg = jnp.asarray(rng.integers(0, V, 1024).astype(np.int32))
    scal = jnp.ones((1, 2), jnp.float32)

    def k3(slots_ref, sneg_ref, scal_ref, stats_ref):
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            stats_ref[0, 0] = jnp.float32(slots_ref[0] + sneg_ref[0])

    def f3(s, sn, sc):
        return pl.pallas_call(
            k3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((NWL,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1024,), lambda i: (i // 8,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(s, jnp.broadcast_to(sn, (-(-G // 8), 1024)).reshape(-1), sc)

    print(f"+ all SMEM streams             {timeit(f3, slots, sneg, scal):7.2f}")

    # --- 4: + metac VMEM stream
    def k4(slots_ref, metac_ref, stats_ref):
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            stats_ref[0, 0] = jnp.float32(slots_ref[0] + metac_ref[0, 0])

    def f4(s, m):
        return pl.pallas_call(
            k4,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((NWL,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, 128), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(s, m)

    print(f"+ SMEM slots + VMEM meta       {timeit(f4, slots, meta):7.2f}")

    # --- 5: + whole-table ANY input -> aliased VMEM output w/ i==0 DMA
    def k5(slots_ref, emb_hbm, emb_out, stats_ref, sem):
        @pl.when(pl.program_id(0) == 0)
        def _():
            cp = pltpu.make_async_copy(emb_hbm, emb_out, sem)
            cp.start()
            cp.wait()

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            stats_ref[0, 0] = jnp.float32(slots_ref[0])

    def f5(s, e):
        return pl.pallas_call(
            k5,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((NWL,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((V, d), jnp.float32),
                jax.ShapeDtypeStruct((1, 2), jnp.float32),
            ],
            input_output_aliases={1: 0},
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(s, e)

    def f5w(s, e):
        a, b = f5(s, e)
        return b, a

    print(f"+ table in/out + i0 DMA        {timeit(f5w, slots, emb):7.2f}")

    # --- 6: 5 + the gather loop (U=32) — the real kernel's first section
    def k6(slots_ref, emb_hbm, emb_out, stats_ref, phi_ref, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(emb_hbm, emb_out, sem)
            cp.start()
            cp.wait()

        U = 32

        def gather(tu, _):
            base = tu * U
            for j in range(U):
                t = base + j
                phi_ref[t, :] = emb_out[slots_ref[t], :]
            return 0

        jax.lax.fori_loop(0, NWL // U, gather, 0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            stats_ref[0, 0] = phi_ref[0, 0]

    def f6(s, e):
        a, b = pl.pallas_call(
            k6,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((NWL,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((V, d), jnp.float32),
                jax.ShapeDtypeStruct((1, 2), jnp.float32),
            ],
            input_output_aliases={1: 0},
            scratch_shapes=[
                pltpu.VMEM((NWL, d), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(s, e)
        return b, a

    print(f"6: 5 + gather loop             {timeit(f6, slots, emb):7.2f}")


if __name__ == "__main__":
    main()
