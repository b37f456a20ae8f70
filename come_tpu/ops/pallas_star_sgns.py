"""Fused tied-table star-SGNS kernel — the O2 fan-out formulation.

The reference's O2 pass trains every edge in both directions against the
single ``node_embedding`` table (reference ``ADSCModel/node_embeddings.py``
[R], SURVEY.md C7/§3.3).  The paired tier of the walk-banded kernel
reproduced that arc-at-a-time shape and inherited its economics: 2 slots
and 4 row-ops per trained pair, so groups train ~1k pairs in the ~25us a
walk group spends training ~5.7k.  Group time is staging-bound, so the
fix is packing more trained pairs behind every staged row:

  layout   arcs grouped by SOURCE into segments [hub, n1, n2, ...]
           (sampling/stars.py), segments packed into 128-slot rows;
           a segment of fan-out f puts 2f trained pairs on f+1 slots
  stage    PHI[S,d] = node_emb[slots] — ONE gather per slot: O2 is tied
           (both endpoints live in node_embedding), so phi and ctx are
           the same staged row
  mask     per 128-slot block from per-slot metadata (seg id + hub bit):
           m[a,b] = same segment AND exactly one of a,b is the hub —
           i.e. the pairs (u->v_i) and (v_i->u) of each segment, the
           identical pair set to the paired tier on the same edge list
  scores   block-diagonal: s_b = PHI_b @ PHI_b^T   [128,128]     [MXU]
           (segments never span rows, so cross-block scores are all
           masked — 8x less MXU work than a dense [S,S] pass)
  negs     shared pool per R-group block, per-center weight n_t = mask
           row-sum (hub: fan-out f; neighbor: 1 — exactly the per-pair
           negative accounting of the reference kernel)
  scatter  ONE read-modify-write per slot: dphi[t] already carries both
           the source-side and context-side gradient of slot t's node

Net: ~2 pairs/slot (vs 1) and ~2 row-ops/slot (vs 4) — ~4x the trained
pairs per second of the paired tier at identical per-group cost, with
HALF the VMEM residency (one table instead of two), which doubles the V
ceiling of the fused-O2 tier.

Semantics: group-synchronous like every fused tier here — a group's
gradients are computed from the table state at group start and applied
at group end (sequential RMW, so intra-group duplicates compose
additively); groups are sequential.  Gradient-gated against the numpy
oracle in tests/test_stars.py; compiled-vs-interpret gated on hardware by
scripts/verify_kernels_tpu.py (star-o2 tier).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NWL = 1024  # slots per grid step (matches the walk kernel's group size)
BLK = 128  # mask block width == sampling/stars.py row width


def _star_kernel(
    seed_ref,  # [1] i32 (scalar prefetch; reserved for SR/bf16 tiers)
    slots_ref,  # [NWL] i32 (SMEM): staged node id per slot
    metac_ref,  # [NWL/BLK, BLK] i32 (VMEM): seg*2+hub, lane-oriented
    #             (row b = block b's metadata; ROW-LOCAL seg ids < BLK/2,
    #             so values are f32-exact for the in-kernel transpose)
    sneg_ref,  # [KPp] i32 (SMEM): this R-block's negative pool
    scal_ref,  # [1, 2] f32 (SMEM): lr, negative_weight
    emb_hbm,  # [V, d] HBM (ANY): source table, DMA'd in at i == 0
    emb_out,  # [V, d] VMEM (aliased output working table)
    stats_ref,  # [1, 2] SMEM f32: loss, n_pairs
    phi_ref,  # [NWL, d] f32 scratch: staged rows
    dphi_ref,  # [NWL, d] f32 scratch: per-slot updates (pre-scaled by -lr)
    cneg_ref,  # [KP, d] f32 scratch: staged pool
    dneg_ref,  # [KP, d] f32 scratch: accumulated pool gradient
    acc_ref,  # [1, 2] SMEM f32
    dma_sem,
    KP: int,
    R: int,
    MXU_BF16: bool,
    INTERPRET: bool,
):
    mxu_t = jnp.bfloat16 if MXU_BF16 else jnp.float32
    d = phi_ref.shape[1]
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

    # fresh pool every R groups; gradient applied at the R-block boundary
    # (bounded staleness, staging amortized — walk-kernel discipline)
    @pl.when(i % R == 0)
    def _stage_pool():
        def g(k, _):
            cneg_ref[k, :] = emb_out[sneg_ref[k], :]
            return 0

        jax.lax.fori_loop(0, KP, g, 0)
        dneg_ref[:, :] = jnp.zeros_like(dneg_ref)

    # ---- stage: ONE row gather per slot (tied table).  U matches the
    # walk kernel's measured-best unroll.
    U = 32

    def gather(tu, _):
        base = tu * U
        for j in range(U):
            t = base + j
            phi_ref[t, :] = emb_out[slots_ref[t], :]
        return 0

    jax.lax.fori_loop(0, NWL // U, gather, 0)

    cneg_m = cneg_ref[:, :].astype(mxu_t)
    # identity for the lane->sublane transpose of the metadata row: a
    # [NWL-1, 1]-blocked VMEM metadata input would ship 128x tile padding
    # (512KB DMA per group for 4KB of data), so the sublane orientation
    # is derived IN-kernel instead: mr = I @ mc^T on the MXU.  Row-local
    # seg ids keep meta < BLK, exactly representable in f32.
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    ).astype(jnp.float32)
    loss = 0.0
    npairs = 0.0
    # ---- block-diagonal positive + negative pass (segments never span
    # rows, so cross-block scores are all masked; [BLK, BLK] blocks
    # measured FASTER per group than the walk kernel's group-wide tall
    # matmuls here — the star group is staging-latency-bound, not
    # MXU-bound, and small blocks shorten the dependency chain)
    for b in range(NWL // BLK):
        phi_bm = phi_ref[pl.ds(b * BLK, BLK), :].astype(mxu_t)  # [BLK, d]
        mc = metac_ref[pl.ds(b, 1), :]  # [1, BLK]
        mr = jax.lax.dot_general(
            eye, mc.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [BLK, 1] — the same metadata, sublane-wise
        # meta = seg*2 + hub; pads are -2 (seg -1, hub 0) and self-mask:
        # pad-pad fails the hub xor, pad-real fails the seg match
        m = (
            ((mr >> 1) == (mc >> 1)) & (((mr ^ mc) & 1) == 1)
        ).astype(jnp.float32)  # [BLK, BLK]
        s = jax.lax.dot_general(
            phi_bm, phi_bm,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BLK, BLK]
        g = (jax.nn.sigmoid(s) - 1.0) * m
        loss += -jnp.sum(m * jax.nn.log_sigmoid(s))
        n_t = jnp.sum(m, axis=1, keepdims=True)  # [BLK, 1]
        npairs += jnp.sum(n_t)
        g_m = g.astype(mxu_t)
        # source side (g @ phi) plus context side (g^T @ phi) — tied, so
        # both land on the same per-slot row update
        dpos = jnp.dot(g_m, phi_bm, preferred_element_type=jnp.float32)
        dpos += jax.lax.dot_general(
            g_m, phi_bm,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # shared-pool negatives, weighted by the slot's source-pair count
        # (hub: fan-out; neighbor: 1 — reference per-pair accounting)
        sn = jax.lax.dot_general(
            phi_bm, cneg_m,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BLK, KP]
        gn = jax.nn.sigmoid(sn) * (negw * n_t)
        loss += -negw * jnp.sum(n_t * jax.nn.log_sigmoid(-sn))
        gn_m = gn.astype(mxu_t)
        dpos += jnp.dot(gn_m, cneg_m, preferred_element_type=jnp.float32)
        dneg_ref[:, :] += jax.lax.dot_general(
            gn_m, phi_bm,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dphi_ref[pl.ds(b * BLK, BLK), :] = dpos * (-lr)

    acc_ref[0, 0] += loss
    acc_ref[0, 1] += npairs

    # ---- scatter: one RMW per slot (pad slots add exact zeros to row 0)
    def scatter(tu, _):
        base = tu * U
        for j in range(U):
            t = base + j
            v = slots_ref[t]
            emb_out[v, :] = emb_out[v, :] + dphi_ref[t, :]
        return 0

    jax.lax.fori_loop(0, NWL // U, scatter, 0)

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
    static_argnames=("mxu_bf16", "pool_refresh", "interpret"),
)
def fused_star_sgns_step(
    emb: jnp.ndarray,
    slots: jnp.ndarray,
    meta: jnp.ndarray,
    shared_negs: jnp.ndarray,
    lr,
    negative_weight,
    seed,
    mxu_bf16: bool = False,
    pool_refresh: int = 1,
    interpret: bool = False,
):
    """One O2 macro step over a star-packed slot stream, fully fused.

    Args:
      emb: [V, d] f32 tied node table (VMEM-resident; d multiple of 128).
      slots: int32 [T], T padded up to a multiple of NWL by the wrapper
        (pads use meta PAD_META and self-mask).  Build with
        ``sampling.stars.build_star_layout``.
      meta: int32 [T], seg_id*2 + is_hub per slot (-2 at pads).  Segments
        must not span 128-slot rows (the layout builder guarantees it).
      shared_negs: int32 [KP] or [ceil(G/pool_refresh), KP] (fresh pool
        per R-group block, walk-kernel convention).
      negative_weight: typically k/KP — keeps expected negative work per
        trained pair at the reference's k draws.

    Returns (emb', loss, n_pairs) with n_pairs == 2 * arcs in the stream.
    """
    if emb.dtype != jnp.float32:
        raise ValueError("star kernel is f32-tables-only (tied residency "
                         "already halves VMEM; bf16 tier not needed yet)")
    T = slots.shape[0]
    KP = shared_negs.shape[-1]
    V, d = emb.shape
    G = -(-T // NWL)
    if G * NWL != T:
        pad = G * NWL - T
        slots = jnp.pad(slots, (0, pad))
        meta = jnp.pad(meta, (0, pad), constant_values=-2)
    slots = slots.astype(jnp.int32)
    meta = meta.astype(jnp.int32)
    R = int(pool_refresh)
    n_pools = -(-G // R)
    if shared_negs.ndim == 1:
        sneg_g = jnp.broadcast_to(shared_negs, (n_pools, KP))
    else:
        if shared_negs.shape[0] != n_pools:
            raise ValueError(
                f"per-block pools: got {shared_negs.shape[0]} pools for "
                f"{G} groups at pool_refresh={R} (need {n_pools})"
            )
        sneg_g = shared_negs
    # 1-D s32 operands carry XLA layout T(1024): pool stride pads to 1024
    KPp = -(-KP // 1024) * 1024
    if KPp != KP:
        sneg_g = jnp.pad(sneg_g, ((0, 0), (0, KPp - KP)))
    scal = jnp.stack(
        [jnp.asarray(lr, jnp.float32),
         jnp.asarray(negative_weight, jnp.float32)]
    ).reshape(1, 2)

    kernel = functools.partial(
        _star_kernel, KP=KP, R=R, MXU_BF16=mxu_bf16, INTERPRET=interpret
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (NWL,), lambda i, _s: (i,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((NWL // BLK, BLK), lambda i, _s: (i, 0)),
            pl.BlockSpec(
                (KPp,), lambda i, _s: (i // R,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 2), lambda i, _s: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NWL, d), jnp.float32),  # phi staging
            pltpu.VMEM((NWL, d), jnp.float32),  # per-slot updates
            pltpu.VMEM((KP, d), jnp.float32),  # pool staging
            pltpu.VMEM((KP, d), jnp.float32),  # pool gradient
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
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        slots.reshape(G * NWL),
        meta.reshape(G * (NWL // BLK), BLK),
        sneg_g.astype(jnp.int32).reshape(n_pools * KPp),
        scal,
        emb,
    )
    return new_emb, stats[0, 0], stats[0, 1]
