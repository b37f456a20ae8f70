"""On-TPU kernel correctness gate (VERDICT r1 item 5).

Runs every Pallas kernel tier COMPILED on the real chip and asserts the
result matches interpret-mode execution of the SAME kernel on identical
inputs.  Interpret mode lowers the kernel body to plain XLA ops (no Mosaic),
so a mismatch isolates a Mosaic miscompile — the class of bug that CPU
interpret-mode unit tests cannot catch and that docs/PERF.md documents
finding twice on v5e (aliased-VMEM outputs not input-initialized;
scalar-predicated vector selects).  Determinism: the in-kernel PRNG is off
(reduced_window=False -> full window, no stochastic rounding), so compiled
and interpreted runs are bit-comparable up to reduction order.

Tiers checked (V chosen NEAR each tier boundary, docs/PERF.md):

  flat-f32        fused_sgns_step / _tied, small V
  walk-f32        fused_walk_sgns_step, small V + V=90k (f32 VMEM edge ~98k)
  walk-bf16-mxu   bf16 MXU scoring, f32 tables
  walk-bf16-tab   bf16-resident packed tables, small V + V=180k (edge ~196k)
  walk-paired-o2  paired (edge) mode of the walk kernel
  star-o2         tied star fan-out O2 kernel (ops/pallas_star_sgns.py)
  walk-gen-csr    in-kernel walk generation from VMEM CSR
  banded-xla      banded_walk_sgns_step vs the numpy shared-pool oracle
                  (pure XLA — no Mosaic; gates TPU numerics instead)

Run:  python scripts/verify_kernels_tpu.py [--quick]
(--quick skips the two large-V boundary tiers; ~1 min less compile time.)
Exit 0 = all pass.  bench environments should run this before trusting any
throughput number.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _maxdiff(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(np.abs(a - b).max())


def _check(name, pairs, tol, t0):
    worst = max(_maxdiff(a, b) for a, b in pairs)
    ok = worst <= tol
    print(
        f"{'PASS' if ok else 'FAIL'} {name:<18} maxdiff {worst:.3e} "
        f"(tol {tol:.1e})  [{time.perf_counter() - t0:.1f}s]"
    )
    return ok


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend (this gate is for real hardware)")
        return 0

    from come_tpu.losses.sgns_banded import banded_walk_sgns_step
    from come_tpu.ops.pallas_sgns import fused_sgns_step, fused_sgns_step_tied
    from come_tpu.ops.pallas_walk_sgns import fused_walk_sgns_step

    rng = np.random.default_rng(7)
    d = 128
    lr, negw = 0.025, 5 / 64.0
    ok = True

    def tables(V, scale=0.3):
        ei = (rng.normal(size=(V, d)) * scale).astype(np.float32)
        eo = (rng.normal(size=(V, d)) * scale).astype(np.float32)
        return jnp.asarray(ei), jnp.asarray(eo)

    # ---- flat-pair fused kernel (untied + tied) ----
    t0 = time.perf_counter()
    V = 4096
    ei, eo = tables(V)
    P, KP = 2048, 64
    c = jnp.asarray(rng.integers(0, V, P).astype(np.int32))
    x = jnp.asarray(rng.integers(0, V, P).astype(np.int32))
    sn = jnp.asarray(rng.integers(0, V, KP).astype(np.int32))
    m = jnp.asarray((rng.random(P) < 0.9).astype(np.float32))
    hw = fused_sgns_step(ei, eo, c, x, sn, m, lr, negw)
    it = fused_sgns_step(ei, eo, c, x, sn, m, lr, negw, interpret=True)
    # losses are O(P)-sized f32 sums whose reduction order differs between
    # Mosaic and XLA — compare per-pair, not the raw sum
    ok &= _check(
        "flat-f32",
        [(hw[0], it[0]), (hw[1], it[1]),
         (float(hw[2]) / P, float(it[2]) / P)],
        3e-5, t0,
    )

    t0 = time.perf_counter()
    hw = fused_sgns_step_tied(ei, c, x, sn, m, lr, negw)
    it = fused_sgns_step_tied(ei, c, x, sn, m, lr, negw, interpret=True)
    ok &= _check(
        "flat-f32-tied",
        [(hw[0], it[0]), (float(hw[1]) / P, float(it[1]) / P)],
        3e-5, t0,
    )

    # ---- walk-banded fused kernel tiers ----
    def walk_case(V, bf16_tables, mxu_bf16, tol, name):
        nonlocal ok
        t0 = time.perf_counter()
        ei, eo = tables(V)
        if bf16_tables:
            ei, eo = ei.astype(jnp.bfloat16), eo.astype(jnp.bfloat16)
        B, L, W = 16, 40, 5
        walks = jnp.asarray(rng.integers(0, V, (B, L)).astype(np.int32))
        R = 2
        n_pools = -(-(B // 8) // R)
        pools = jnp.asarray(
            rng.integers(0, V, (n_pools, KP)).astype(np.int32)
        )

        def run(interp):
            return fused_walk_sgns_step(
                ei, eo, walks, pools, lr, negw, 0, window=W,
                interpret=interp, reduced_window=False, mxu_bf16=mxu_bf16,
                pool_refresh=R,
            )

        hw, it = run(False), run(True)
        # compare only touched rows at large V (full-table diff is IO-bound)
        touched = np.unique(
            np.concatenate([np.asarray(walks).ravel(),
                            np.asarray(pools).ravel()])
        )
        npw, npi = float(hw[3]), float(it[3])
        pairs = [
            (hw[0][touched], it[0][touched]),
            (hw[1][touched], it[1][touched]),
            (float(hw[2]) / max(npw, 1), float(it[2]) / max(npi, 1)),
            (npw, npi),
        ]
        ok &= _check(name, pairs, tol, t0)

    walk_case(4096, False, False, 3e-5, "walk-f32")
    walk_case(4096, False, True, 3e-3, "walk-bf16-mxu")
    walk_case(4096, True, False, 2e-2, "walk-bf16-tab")

    # ---- paired (O2 edge) mode: pre-swapped ctx staging + elementwise
    # positive pass — its own Mosaic surface, gated separately ----
    t0 = time.perf_counter()
    V = 4096
    ei, eo = tables(V)
    B_r, EPR = 16, 64
    rows = jnp.asarray(
        rng.integers(0, V, (B_r, 2 * EPR)).astype(np.int32)
    )
    pools = jnp.asarray(rng.integers(0, V, (1, KP)).astype(np.int32))

    def run_paired(interp):
        return fused_walk_sgns_step(
            ei, ei, rows, pools, lr, negw, 0, window=1,
            interpret=interp, reduced_window=False, pool_refresh=2,
            paired=True,
        )

    hw, it = run_paired(False), run_paired(True)
    npw, npi = float(hw[3]), float(it[3])
    ok &= _check(
        "walk-paired-o2",
        [(hw[0], it[0]), (hw[1], it[1]),
         (float(hw[2]) / max(npw, 1), float(it[2]) / max(npi, 1)),
         (npw, npi)],
        3e-5, t0,
    )

    # ---- star (O2 fan-out) tier: tied single-table staging, metadata
    # mask with the in-kernel MXU lane->sublane transpose — its own
    # Mosaic surface (ops/pallas_star_sgns.py) ----
    t0 = time.perf_counter()
    from come_tpu.ops.pallas_star_sgns import fused_star_sgns_step
    from come_tpu.sampling.stars import build_star_layout

    V = 4096
    ei, _ = tables(V)
    eu = rng.integers(0, V, 1800).astype(np.int64)
    ev = (eu + 1 + rng.integers(0, V - 1, 1800)) % V  # no self loops
    s_np, m_np = build_star_layout(eu, ev, V)

    def run_star(interp):
        return fused_star_sgns_step(
            ei, jnp.asarray(s_np), jnp.asarray(m_np),
            jnp.asarray(rng.integers(0, V, (2, KP)).astype(np.int32)),
            lr, negw, 0, pool_refresh=2, interpret=interp,
        )

    rng_state = rng.bit_generator.state
    hw = run_star(False)
    rng.bit_generator.state = rng_state  # same pools for both runs
    it = run_star(True)
    npw, npi = float(hw[2]), float(it[2])
    ok &= _check(
        "star-o2",
        [(hw[0], it[0]),
         (float(hw[1]) / max(npw, 1), float(it[1]) / max(npi, 1)),
         (npw, npi)],
        3e-5, t0,
    )

    # ---- GEN_WALKS (in-kernel walk generation): SMEM CSR scalar loads +
    # VMEM one-hot lane extraction — its own Mosaic surface; bench
    # publishes o1_fresh_kernel_gen, so the gate must cover it ----
    t0 = time.perf_counter()
    from come_tpu.graphs import sbm_graph
    from come_tpu.ops.pallas_walk_sgns import (
        NWL,
        fused_walk_sgns_gen_step,
        pack_csr_gen,
    )

    g, _ = sbm_graph(1500, 4, p_in=0.1, p_out=0.01, seed=5)
    ei, eo = tables(1500)
    Lg, Wg = 24, 4
    starts = jnp.asarray(
        rng.integers(0, 1500, 2 * (NWL // 128)).astype(np.int32)
    )
    bits = jnp.asarray(
        rng.integers(0, 2**31, (2, NWL), dtype=np.int64).astype(np.int32)
    )
    ip1, dg1, ix2 = pack_csr_gen(g.indptr, g.indices)
    pools = jnp.asarray(rng.integers(0, 1500, (1, KP)).astype(np.int32))

    def run_gen(interp):
        return fused_walk_sgns_gen_step(
            ei, eo, starts, bits, jnp.asarray(ip1), jnp.asarray(dg1),
            jnp.asarray(ix2), pools, lr, negw, 0, walk_length=Lg,
            window=Wg, interpret=interp, reduced_window=False,
            pool_refresh=2,
        )

    hw, it = run_gen(False), run_gen(True)
    npw, npi = float(hw[3]), float(it[3])
    ok &= _check(
        "walk-gen-csr",
        [(hw[0], it[0]), (hw[1], it[1]),
         (float(hw[2]) / max(npw, 1), float(it[2]) / max(npi, 1)),
         (npw, npi)],
        3e-5, t0,
    )
    if not args.quick:
        # near the f32 VMEM tier edge (~98k rows @ d=128, 48MB budget)
        walk_case(90000, False, False, 3e-5, "walk-f32-90k")
        # near the bf16 packed-table tier edge (~196k rows)
        walk_case(180000, True, False, 2e-2, "walk-bf16-180k")

    # ---- banded XLA tier: pure XLA, gate vs the numpy oracle ----
    t0 = time.perf_counter()
    from come_tpu.evaluation.oracle import walk_banded_shared_pool_grads

    V = 2048
    ei, eo = tables(V)
    B, L, W = 8, 16, 3
    walks = rng.integers(0, V, (B, L)).astype(np.int32)
    pool = rng.integers(0, V, KP).astype(np.int32)
    key = jax.random.key(0)
    ni, no, loss, npairs = banded_walk_sgns_step(
        ei, eo, jnp.asarray(walks), jnp.asarray(pool), lr, negw, key,
        window=W, walk_block=B, reduced_window=False, mxu_bf16=False,
    )
    wrow = np.full((B, L), W, np.int32)
    o_loss, o_np, o_din, o_dout = walk_banded_shared_pool_grads(
        np.asarray(ei), np.asarray(eo), walks, pool, wrow, negw
    )
    pairs = [
        (ni, np.asarray(ei) - lr * o_din),
        (no, np.asarray(eo) - lr * o_dout),
        (float(loss) / max(float(npairs), 1), o_loss / max(o_np, 1)),
        (float(npairs), float(o_np)),
    ]
    ok &= _check("banded-xla", pairs, 2e-3, t0)

    # ---- banded-star O2 tier: pure XLA (HBM tied table), gate TPU
    # numerics vs the same numpy block oracle the CPU tests use ----
    t0 = time.perf_counter()
    from come_tpu.losses.star_banded import star_banded_sgns_step
    from tests.test_star_banded import ref_block

    V = 2048
    ei, _ = tables(V)
    eu = rng.integers(0, V, 900).astype(np.int64)
    ev = (eu + 1 + rng.integers(0, V - 1, 900)) % V
    s_np, m_np = build_star_layout(eu, ev, V)
    srows = s_np.reshape(-1, 128)
    mrows = m_np.reshape(-1, 128)
    pool = rng.integers(0, V, KP).astype(np.int32)
    ni, loss, npairs = star_banded_sgns_step(
        ei, jnp.asarray(srows), jnp.asarray(mrows), jnp.asarray(pool),
        lr, negw, row_block=srows.shape[0], mxu_bf16=False,
    )
    e = np.asarray(ei).copy()
    o_loss, o_np = ref_block(e, srows, mrows, pool, lr, negw)
    ok &= _check(
        "star-banded-xla",
        [(ni, e),
         (float(loss) / max(float(npairs), 1), o_loss / max(o_np, 1)),
         (float(npairs), float(o_np))],
        2e-3, t0,
    )

    print("ALL PASS" if ok else "FAILURES — do not trust bench numbers")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
