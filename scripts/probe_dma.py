"""Measure per-row HBM->VMEM DMA cost inside a Pallas kernel.

This is the number that decides VERDICT r3 item 5 (a group-paged
HBM-resident fused kernel for single-chip V beyond the bf16 VMEM tier):
a walk group must page 2048 scattered 512B rows in and back out per
group.  Measured on v5e (2026-08, this repo's round 4):

    sequential           20.6 ns/row   (42 us / 2048 rows)
    4-deep pipeline      18.8 ns/row
    8-deep pipeline      15.6 ns/row
    16-deep pipeline     14.1 ns/row   <- floor (~36 GB/s scattered)
    32-deep pipeline     17.9 ns/row

At the 14 ns/row floor, gather+write-back is ~58 us/group — but the
shipping banded-XLA tier (losses/sgns_banded.py) already runs at
~54 us per 1024-slot group-equivalent at large V (105 Mpairs/s).  The
paged fused kernel therefore CANNOT meaningfully beat banded: both sit
at the scattered-row HBM floor, and the paged design would add
cross-group RMW races (write-back of group i racing group i+1's
gather).  Conclusion recorded in docs/PERF.md; the banded tier stays
the single-chip large-V answer, and the row-sharded mesh tiers remove
the V cap entirely.

Run:  python scripts/probe_dma.py   (env DEPTH=n for the pipeline depth)
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, d = 500_000, 128
NROWS = 2048  # rows a walk group must page in (1024 slots x 2 tables)

def kern_seq(idx_ref, tab_hbm, out_ref, row_ref, sem):
    def body(i, acc):
        r = idx_ref[i]
        cp = pltpu.make_async_copy(tab_hbm.at[pl.ds(r, 1)], row_ref, sem)
        cp.start(); cp.wait()
        return acc + row_ref[0, 0]
    out_ref[0, 0] = jax.lax.fori_loop(0, NROWS, body, 0.0)

import os
DEPTH = int(os.environ.get("DEPTH", "8"))

def kern_pipe(idx_ref, tab_hbm, out_ref, rows_ref, sem):
    # DEPTH-deep pipeline: up to DEPTH outstanding row copies
    def start(k):
        r = idx_ref[k]
        pltpu.make_async_copy(
            tab_hbm.at[pl.ds(r, 1)], rows_ref.at[pl.ds(k % DEPTH, 1)],
            sem.at[k % DEPTH],
        ).start()
    def wait(k):
        r = idx_ref[k]
        pltpu.make_async_copy(
            tab_hbm.at[pl.ds(r, 1)], rows_ref.at[pl.ds(k % DEPTH, 1)],
            sem.at[k % DEPTH],
        ).wait()
    for k in range(DEPTH):
        start(k)
    def body(i, acc):
        @pl.when(i + DEPTH < NROWS)
        def _():
            start(i + DEPTH)
        wait(i)
        return acc + rows_ref[i % DEPTH, 0]
    out_ref[0, 0] = jax.lax.fori_loop(0, NROWS, body, 0.0)

def run(kern, scratch):
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )
    return jax.jit(f)

tab = jnp.ones((V, d), jnp.float32)
idx = jax.random.randint(jax.random.key(0), (max(NROWS, 1024),), 0, V, dtype=jnp.int32)

for name, kern, scratch in [
    (f"{DEPTH}-deep pipeline", kern_pipe, [pltpu.VMEM((DEPTH, d), jnp.float32), pltpu.SemaphoreType.DMA((DEPTH,))]),
]:
    f = run(kern, scratch)
    o = f(idx, tab); o.block_until_ready()
    t0 = time.perf_counter()
    REP = 20
    for _ in range(REP):
        o = f(idx, tab)
    o.block_until_ready()
    dt = (time.perf_counter() - t0) / REP
    print(f"{name}: {dt*1e6:8.1f} us for {NROWS} rows -> {dt/NROWS*1e9:6.1f} ns/row")
