"""Walk-banded fused SGNS kernel — the MXU formulation of skip-gram.

Key observation: every context of a walk position is another position of the
SAME walk, so one grid step can stage a group of walks' rows once and score
ALL of their window pairs as a single dense matmul with a banded mask:

  stage    PHI[S,d] = node_emb[walks], CTX[S,d] = ctx_emb[walks]
           (S = NW walks x Lp padded positions; 2S row gathers for
            ~NW*L*(W+1)/1.x trained pairs — ~0.2 row ops per pair, vs 4
            in the flat-pair kernel)
  mask     M[S,S] built IN-kernel from iota (walk block, position, range)
           and the reduced-window draw w ~ U{1..W} from the on-chip PRNG
  scores   S_pos = PHI @ CTX^T      (banded entries used)        [MXU]
           S_neg = PHI @ Cneg^T     (shared pool, KP rows)       [MXU]
  grads    G = (sigmoid(S_pos)-1) * M
           dPHI = G @ CTX + Gneg @ Cneg;  dCTX = G^T @ PHI       [MXU]
           per-center negative weight n_t = row-sum of M keeps the noise
           work per trained pair identical to per-pair counting
  scatter  2S row read-modify-writes; each group stages a FRESH negative
           pool and applies its pool gradient at its own group boundary
           (cross-group accumulation of the pool update is unstable at
           large walk batches)

This makes the reference's hot loop #3 (SURVEY.md §3.2) MXU-bound instead of
row-op bound.  Semantics: one walk-group (NW*L positions) updates
synchronously; groups are sequential (grid order).  The reduced-window draw
uses the kernel PRNG (same U{1..W} marginal as gensim's `random % window`);
the XLA path's draws differ stream-wise — quality is equivalent, asserted
end-to-end.

VMEM note: S x S f32 score/mask temporaries are processed in column blocks
of CB so peak live VMEM stays within budget alongside the resident tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NWL = 1024  # slots per grid step (1-D s32 operands carry XLA layout T(1024))


M_HI = 0xFFFF0000
M_LO = 0x0000FFFF


def _bc(x, dt, interpret):
    """Bit-reinterpret at same width.  Mosaic's bitcast needs >= 2-D, so
    row vectors go through a (1, d) reshape at call sites; interpret mode
    uses the XLA op (pltpu.bitcast has no CPU lowering)."""
    if interpret:
        return jax.lax.bitcast_convert_type(x, dt)
    return pltpu.bitcast(x, dt)


# bf16 tables are stored ROW-PAIR PACKED as u32 [V/2, d]: logical rows 2r
# (low 16 bits) and 2r+1 (high bits) share physical row r.  bf16 VMEM
# memrefs cannot be dynamically indexed by single row (two rows per
# sublane); the u32 view carries f32 tiling, so the kernel's dynamic
# row gathers/scatters stay legal, at the same 2 bytes/element residency.


def _unpack_row(bits_u32, sh, interpret):
    """u32 packed row -> f32 row of the selected half (sh = 16*(v&1)).
    The bf16 pattern lands in the f32 high bits (an exact f32 embedding
    of bf16).  Pure shift/mask arithmetic — no scalar-predicated vector
    select, which Mosaic miscompiled data-dependently."""
    pat = ((bits_u32 >> sh) & jnp.uint32(M_LO)) << jnp.uint32(16)
    return _bc(pat.reshape(1, -1), jnp.float32, interpret).reshape(-1)


def _pack_row(bits_u32, new_f32, sh, rnd_u32, interpret):
    """Write the f32 value back into the selected half of the packed row
    (sh = 16*(v&1)), stochastically rounded to bf16 when rnd_u32 is not
    None (unbiased — small SGD deltas on O(1) params survive in
    expectation where round-to-nearest drops every update below 2^-8 of
    the magnitude); truncation otherwise (interpret/test path).  The
    partner row's bits are preserved."""
    nb = _bc(new_f32.reshape(1, -1), jnp.uint32, interpret).reshape(-1)
    if rnd_u32 is not None:
        nb = nb + (rnd_u32 & jnp.uint32(M_LO))
    half = nb >> jnp.uint32(16)  # bf16 pattern, low 16 bits
    keep = ~(jnp.uint32(M_LO) << sh)
    return (bits_u32 & keep) | (half << sh)


def _walk_kernel(
    seed_ref,  # [1] i32 (scalar prefetch)
    walks_ref,  # [NWL] i32 (SMEM): this group's walk slots (GEN_WALKS:
    #             only slot j*Lp of each walk j holds the START node)
    sneg_ref,  # [KP] i32 (SMEM): this group's negative pool
    scal_ref,  # [1, 2] f32 (SMEM): lr, negative_weight
    emb_in_hbm,  # [V, d] HBM (ANY): source table, DMA'd in at i == 0
    emb_out_hbm,  # [V, d] HBM (ANY)
    *rest,
    # GEN_WALKS adds inputs  (bits_ref [NWL] i32 SMEM per group,
    #                         indptr_hbm [Rp,128] i32, indices_hbm [Re,128])
    # then outputs (emb_in_out, emb_out_out, stats_ref) and scratches
    # (phi, ctx, dphi, dctx, cneg, dneg, rnd, acc, dma_sem
    #  [+ wgen SMEM, indptr VMEM, indices VMEM when GEN_WALKS])
    KP: int,
    Lp: int,
    L: int,
    W: int,
    CB: int,
    USE_PRNG: bool,
    MXU_BF16: bool,
    R: int,
    TABLES_BF16: bool,  # tables arrive u32 row-pair packed, [V/2, d]
    SR: bool,
    PAIRED: bool,  # O2 mode: slots 2i/2i+1 are one edge (u, v); the band
    #               trains exactly (u->v) and (v->u), n_t = 1 per slot
    GEN_WALKS: bool,  # generate the walks IN-kernel from VMEM-resident CSR
    INTERPRET: bool,
):
    if GEN_WALKS:
        bits_ref, indptr_smem, deg_smem, indices_hbm = rest[:4]
        rest = rest[4:]
    (emb_in_out, emb_out_out, stats_ref,
     phi_ref, ctx_ref, dphi_ref, dctx_ref, cneg_ref, dneg_ref, rnd_ref,
     acc_ref, dma_sem) = rest[:12]
    if GEN_WALKS:
        wgen_ref, indices_ref = rest[12:14]

    mxu_t = jnp.bfloat16 if (MXU_BF16 or TABLES_BF16) else jnp.float32
    d = phi_ref.shape[1]
    i = pl.program_id(0)
    n = pl.num_programs(0)
    lr = scal_ref[0, 0]
    negw = scal_ref[0, 1]

    @pl.when(i == 0)
    def _init():
        acc_ref[0, 0] = 0.0
        acc_ref[0, 1] = 0.0
        # Explicitly DMA the tables HBM -> VMEM working buffers.  The
        # output refs of an aliased whole-array VMEM operand are NOT
        # reliably initialized with the input data (observed on v5e:
        # works at some table sizes, garbage at others), and keeping the
        # inputs in ANY/HBM instead of VMEM halves the kernel's VMEM
        # demand (2x table instead of 4x).
        cp = pltpu.make_async_copy(emb_in_hbm, emb_in_out, dma_sem)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(emb_out_hbm, emb_out_out, dma_sem)
        cp.start()
        cp.wait()
        if GEN_WALKS:
            cp = pltpu.make_async_copy(indices_hbm, indices_ref, dma_sem)
            cp.start()
            cp.wait()

    if GEN_WALKS:
        # ---- in-kernel walk generation ----
        # CSR offsets and degrees live in SMEM (direct scalar loads);
        # only the neighbor lists need VMEM ([*, 128] i32 rows, lane
        # picked by a vector one-hot reduce — no scalar-predicated vector
        # selects, the known Mosaic hazard).  The NW walk chains advance
        # in LOCKSTEP (position-major loop) so their independent loads
        # and reduces pipeline instead of serializing into one long
        # dependency chain.  The random bits arrive as an INPUT (host
        # threefry), so compiled and interpreted runs are bit-comparable
        # and the walk stream is reproducible in numpy (tests/oracle).
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def ext(ref, idx):
            row = ref[idx // 128, :].reshape(1, 128)
            lane = idx % 128
            return jnp.sum(jnp.where(lane_iota == lane, row, 0))

        inv24 = jnp.float32(1.0 / (1 << 24))
        NW_ = NWL // Lp
        vs = []
        for j in range(NW_):
            v = walks_ref[j * Lp]
            wgen_ref[j * Lp] = v
            vs.append(v)
        for t in range(1, Lp):
            for j in range(NW_):
                if t < L:
                    v = vs[j]
                    b = bits_ref[j * Lp + t]
                    lo = indptr_smem[v]
                    deg = deg_smem[v]
                    u = ((b >> 8) & jnp.int32(0xFFFFFF)).astype(
                        jnp.float32
                    ) * inv24
                    r = jnp.minimum(
                        (u * deg.astype(jnp.float32)).astype(jnp.int32),
                        jnp.maximum(deg - 1, 0),
                    )
                    nxt = ext(indices_ref, lo + r)
                    ok = (deg > 0).astype(jnp.int32)
                    vs[j] = nxt * ok + v * (1 - ok)  # isolated nodes stay
                    wgen_ref[j * Lp + t] = vs[j]
                else:
                    wgen_ref[j * Lp + t] = 0  # padded slots (masked)

        def wslot(t):
            return wgen_ref[t]
    else:

        def wslot(t):
            return walks_ref[t]

    # stage a fresh pool every R groups; its accumulated gradient is
    # applied at the R-block boundary.  Unbounded cross-group accumulation
    # of the pool update is what used to blow up ctx rows at large walk
    # batches; R bounds both the staleness and the accumulated magnitude
    # while amortizing the 2*KP staging row-ops over R groups.
    @pl.when(i % R == 0)
    def _stage_pool():
        def g(k, _):
            nk = sneg_ref[k]
            if TABLES_BF16:
                cneg_ref[k, :] = _unpack_row(
                    emb_out_out[nk >> 1, :],
                    ((nk & 1) << 4).astype(jnp.uint32), INTERPRET,
                )
            else:
                cneg_ref[k, :] = emb_out_out[nk, :]
            return 0

        jax.lax.fori_loop(0, KP, g, 0)
        dneg_ref[:, :] = jnp.zeros_like(dneg_ref)

    # ---- stage this group's rows (row ops amortized over ~L*(W+1) pairs).
    # U = row-ops per fori_loop iteration; swept on v5e (round 4):
    # 8 -> 238-245 M, 16 -> 242 M, 32 -> 246-247 M, 64 -> 237 M — 32 sits
    # at the top of the noise band without regressing any mode.
    U = 32

    def gather(tu, _):
        base = tu * U
        for j in range(U):
            t = base + j
            v = wslot(t)
            # PAIRED: ctx staged PRE-SWAPPED — slot t holds the ctx row of
            # its 2-slot partner t^1, so the positive pass is elementwise
            c = wslot(t ^ 1) if PAIRED else v
            if TABLES_BF16:
                r = v >> 1
                sh = ((v & 1) << 4).astype(jnp.uint32)
                phi_ref[t, :] = _unpack_row(emb_in_out[r, :], sh, INTERPRET)
                rc = c >> 1
                shc = ((c & 1) << 4).astype(jnp.uint32)
                ctx_ref[t, :] = _unpack_row(
                    emb_out_out[rc, :], shc, INTERPRET
                )
            else:
                phi_ref[t, :] = emb_in_out[v, :]
                ctx_ref[t, :] = emb_out_out[c, :]
        return 0

    jax.lax.fori_loop(0, NWL // U, gather, 0)

    phi = phi_ref[:, :]  # [S, d]
    ctx = ctx_ref[:, :]
    # MXU inputs in bf16 when enabled (4x MXU rate on v5e); all matmul
    # accumulation stays f32 via preferred_element_type, and the master
    # tables / staged rows / applied updates remain f32 throughout.
    phi_m = phi.astype(mxu_t)

    # ---- reduced-window draw per center slot: w ~ U{1..W}
    if USE_PRNG:
        pltpu.prng_seed(seed_ref[0] + i)
        wbits = pltpu.bitcast(
            pltpu.prng_random_bits((NWL, 1)), jnp.uint32
        )
        wrow = 1 + (wbits % jnp.uint32(W)).astype(jnp.int32)  # [S, 1]
    else:
        # deterministic full window (interpreter tests: no prng lowering
        # on CPU; also matches gensim with reduced-window disabled)
        wrow = jnp.full((NWL, 1), W, jnp.int32)

    if SR:
        # per-element 32-bit draws for stochastic rounding: low 16 bits
        # round the node-table write, high 16 the ctx-table write
        rnd_ref[:, :] = pltpu.bitcast(
            pltpu.prng_random_bits((NWL, d)), jnp.uint32
        )
    prow = jax.lax.broadcasted_iota(jnp.int32, (NWL, 1), 0) % Lp
    brow = jax.lax.broadcasted_iota(jnp.int32, (NWL, 1), 0) // Lp
    row_ok = prow < L  # real position within the walk

    if PAIRED:
        # ---- O2 edge mode: the "band" is one partner slot, so the whole
        # positive pass is elementwise VPU work on the pre-swapped ctx
        # staging (slot t holds partner t^1's row) — no [S, S] score
        # matmuls or mask tensors.  dctx_ref[t] is the gradient for the
        # partner's ctx row; the scatter writes it to wslot(t^1).
        # Partner validity equals own validity (L is even, pairs aligned).
        mvalid = row_ok.astype(jnp.float32)  # [S, 1]
        s_pair = jnp.sum(phi * ctx, axis=1, keepdims=True)  # [S, 1]
        g_pair = (jax.nn.sigmoid(s_pair) - 1.0) * mvalid
        loss_pos = -jnp.sum(mvalid * jax.nn.log_sigmoid(s_pair))
        n_t = mvalid
        dphi = g_pair * ctx
        dctx_ref[:, :] = g_pair * phi
    else:
        # ---- banded positive pass, in column blocks
        dphi = jnp.zeros((NWL, phi.shape[1]), jnp.float32)
        n_t = jnp.zeros((NWL, 1), jnp.float32)
        loss_pos = 0.0
        for cb in range(NWL // CB):
            ctx_blk = ctx_ref[pl.ds(cb * CB, CB), :]  # [CB, d]
            ctx_blk_m = ctx_blk.astype(mxu_t)
            pcol = (
                jax.lax.broadcasted_iota(jnp.int32, (NWL, CB), 1) + cb * CB
            )
            bcol = pcol // Lp
            pcol = pcol % Lp
            off = pcol - prow  # [S, CB]
            m = (
                (bcol == brow)
                & (off != 0)
                & (jnp.abs(off) <= wrow)
                & row_ok
                & (pcol < L)
            ).astype(jnp.float32)
            s_blk = jax.lax.dot_general(
                phi_m, ctx_blk_m,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [S, CB]
            g_blk = (jax.nn.sigmoid(s_blk) - 1.0) * m
            loss_pos += -jnp.sum(m * jax.nn.log_sigmoid(s_blk))
            n_t += jnp.sum(m, axis=1, keepdims=True)
            g_blk_m = g_blk.astype(mxu_t)
            dphi += jnp.dot(
                g_blk_m, ctx_blk_m, preferred_element_type=jnp.float32
            )
            dctx_ref[pl.ds(cb * CB, CB), :] = jax.lax.dot_general(
                g_blk_m, phi_m,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # ---- shared-pool negatives, weighted by each center's pair count
    cneg_m = cneg_ref[:, :].astype(mxu_t)
    sneg = jax.lax.dot_general(
        phi_m, cneg_m,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S, KP]
    gneg = jax.nn.sigmoid(sneg) * (negw * n_t)
    loss_neg = -negw * jnp.sum(
        n_t * jax.nn.log_sigmoid(-sneg)
    )
    gneg_m = gneg.astype(mxu_t)
    dphi += jnp.dot(gneg_m, cneg_m, preferred_element_type=jnp.float32)
    dneg_ref[:, :] += jax.lax.dot_general(
        gneg_m, phi_m,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    acc_ref[0, 0] += loss_pos + loss_neg
    acc_ref[0, 1] += jnp.sum(n_t)

    dphi_ref[:, :] = dphi * (-lr)
    dctx_ref[:, :] = dctx_ref[:, :] * (-lr)

    # ---- scatter (slots with no valid pairs have all-zero updates)
    def scatter(tu, _):
        base = tu * U
        for j in range(U):
            t = base + j
            v = wslot(t)
            # PAIRED: dctx_ref[t] belongs to the partner's ctx row (the
            # ctx staging was pre-swapped in the gather)
            c = wslot(t ^ 1) if PAIRED else v
            if TABLES_BF16:
                r = v >> 1
                sh = ((v & 1) << 4).astype(jnp.uint32)
                bin_ = emb_in_out[r, :]
                new_in = _unpack_row(bin_, sh, INTERPRET) + dphi_ref[t, :]
                emb_in_out[r, :] = _pack_row(
                    bin_, new_in, sh,
                    rnd_ref[t, :] if SR else None, INTERPRET,
                )
                rc = c >> 1
                shc = ((c & 1) << 4).astype(jnp.uint32)
                bout = emb_out_out[rc, :]
                new_out = _unpack_row(bout, shc, INTERPRET) + dctx_ref[t, :]
                emb_out_out[rc, :] = _pack_row(
                    bout, new_out, shc,
                    (rnd_ref[t, :] >> jnp.uint32(16)) if SR else None,
                    INTERPRET,
                )
            else:
                emb_in_out[v, :] = emb_in_out[v, :] + dphi_ref[t, :]
                emb_out_out[c, :] = emb_out_out[c, :] + dctx_ref[t, :]
        return 0

    jax.lax.fori_loop(0, NWL // U, scatter, 0)

    # ---- apply the pool gradient at the R-block boundary (RMW so
    # walk-scatter updates to pool rows within the block are preserved)
    @pl.when((i % R == R - 1) | (i == n - 1))
    def _apply_pool():
        def s(k, _):
            nk = sneg_ref[k]
            if TABLES_BF16:
                r = nk >> 1
                sh = ((nk & 1) << 4).astype(jnp.uint32)
                bits = emb_out_out[r, :]
                new = (
                    _unpack_row(bits, sh, INTERPRET)
                    - lr * dneg_ref[k, :]
                )
                emb_out_out[r, :] = _pack_row(
                    bits, new, sh,
                    rnd_ref[k, :] if SR else None, INTERPRET,
                )
            else:
                emb_out_out[nk, :] = (
                    emb_out_out[nk, :] - lr * dneg_ref[k, :]
                )
            return 0

        jax.lax.fori_loop(0, KP, s, 0)

    @pl.when(i == n - 1)
    def _finish():
        stats_ref[0, 0] = acc_ref[0, 0]
        stats_ref[0, 1] = acc_ref[0, 1]


@functools.partial(
    jax.jit,
    static_argnames=(
        "window", "column_block", "interpret", "reduced_window", "mxu_bf16",
        "pool_refresh", "paired",
    ),
)
def fused_walk_sgns_step(
    emb_in: jnp.ndarray,
    emb_out: jnp.ndarray,
    walks: jnp.ndarray,
    shared_negs: jnp.ndarray,
    lr,
    negative_weight,
    seed,
    window: int = 10,
    column_block: int = 256,
    interpret: bool = False,
    reduced_window: bool = True,
    mxu_bf16: bool = False,
    pool_refresh: int = 1,
    paired: bool = False,
    gen_bits: jnp.ndarray | None = None,       # [G, NWL] i32 (gen mode)
    gen_indptr: jnp.ndarray | None = None,     # [Vp1] i32 (SMEM-resident)
    gen_deg: jnp.ndarray | None = None,        # [Vp1] i32 (SMEM-resident)
    gen_indices: jnp.ndarray | None = None,    # [Re, 128] i32 (VMEM)
):
    """One O1 macro step over a batch of walks, fully fused.

    Args:
      emb_in/emb_out: [V, d] tables (VMEM-resident; d multiple of 128).
      walks: int32 [B, L].  B is wrapped up to a multiple of NWL/Lp walks
        (Lp = L padded to 128); window pairs, reduced windows, negative
        scoring and updates all happen inside the kernel.
      shared_negs: int32 [KP] (one pool for every group) or
        [ceil(G / pool_refresh), KP] (a fresh pool per R-group block).
        The pool gradient is applied at every R-block boundary.
      seed: int32 scalar for the in-kernel reduced-window PRNG.
      pool_refresh: groups per negative pool (R).  Bounds the staleness
        and accumulated magnitude of the pool update while amortizing the
        2*KP staging row-ops over R groups.

    Returns (emb_in', emb_out', loss, n_pairs).

    Table dtype: f32 or bf16 (inferred from ``emb_in``).  bf16 tables halve
    VMEM residency (admitting Flickr-scale V~80k on one v5e chip); SGD
    writes then use stochastic rounding (hardware PRNG; interpret mode
    falls back to round-to-nearest) and all gradient math stays f32.

    ``paired=True`` is the O2 (edge-proximity) mode: each row of ``walks``
    carries L/2 edges interleaved as [u0, v0, u1, v1, ...] and the band
    trains exactly the pairs (u->v) and (v->u) per edge (n_t = 1 per
    slot) — the reference's first-order arc pass (SURVEY.md C7/§3.3)
    through the same staging/pool/scatter machinery as O1.  L must be
    even; pass ``reduced_window=False`` (windows are meaningless here).
    """
    B, L = walks.shape
    gen = gen_bits is not None
    if paired and L % 2:
        raise ValueError("paired mode needs an even number of slots")
    Lp = 128
    if L > Lp:
        raise ValueError(f"walk_length {L} > {Lp} unsupported by the kernel")
    NW = NWL // Lp
    KP = shared_negs.shape[-1]
    V, d = emb_in.shape
    G = -(-B // NW)
    if G * NW != B:
        walks = jnp.resize(walks, (G * NW, L))  # wrap tail with real walks
    # pad positions to Lp with slot 0 (masked by pcol/prow < L)
    walks_p = jnp.pad(walks, ((0, 0), (0, Lp - L)))
    walks_flat = walks_p.reshape(G * NWL).astype(jnp.int32)
    R = int(pool_refresh)
    if gen and tuple(gen_bits.shape) != (G, NWL):
        raise ValueError(
            f"gen_bits shape {gen_bits.shape} != ({G}, {NWL})"
        )
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
    # 1-D s32 operands carry XLA layout T(1024): pad each group's pool to
    # a 1024-id stride so the per-group block aligns (kernel reads [:KP])
    KPp = -(-KP // 1024) * 1024
    if KPp != KP:
        sneg_g = jnp.pad(sneg_g, ((0, 0), (0, KPp - KP)))
    scal = jnp.stack(
        [jnp.asarray(lr, jnp.float32),
         jnp.asarray(negative_weight, jnp.float32)]
    ).reshape(1, 2)

    tables_bf16 = emb_in.dtype == jnp.bfloat16
    if emb_out.dtype != emb_in.dtype:
        raise ValueError("emb_in/emb_out dtypes must match")
    sr = tables_bf16 and reduced_window  # PRNG only lowers on hardware

    if tables_bf16:
        # row-pair pack to u32 [Vp/2, d] (see module comment): bf16 VMEM
        # memrefs can't be dynamically indexed by single row on TPU
        Vp = V + (V & 1)

        def _pack(tb):
            tb = jnp.pad(tb, ((0, Vp - V), (0, 0)))
            u16 = jax.lax.bitcast_convert_type(tb, jnp.uint16)
            lo = u16[0::2].astype(jnp.uint32)
            hi = u16[1::2].astype(jnp.uint32)
            return lo | (hi << 16)

        emb_in_k, emb_out_k = _pack(emb_in), _pack(emb_out)
        tshape = (Vp // 2, d)
        tdt = jnp.uint32
    else:
        emb_in_k, emb_out_k = emb_in, emb_out
        tshape = (V, d)
        tdt = emb_in.dtype

    kernel = functools.partial(
        _walk_kernel, KP=KP, Lp=Lp, L=L, W=int(window), CB=column_block,
        USE_PRNG=reduced_window, MXU_BF16=mxu_bf16, R=R,
        TABLES_BF16=tables_bf16, SR=sr, PAIRED=paired, GEN_WALKS=gen,
        INTERPRET=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (NWL,), lambda i, _s: (i,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (KPp,), lambda i, _s: (i // R,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 2), lambda i, _s: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + ([
            pl.BlockSpec(
                (NWL,), lambda i, _s: (i,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                gen_indptr.shape, lambda i, _s: (0,),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                gen_deg.shape, lambda i, _s: (0,),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ] if gen else []),
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NWL, d), jnp.float32),  # phi staging
            pltpu.VMEM((NWL, d), jnp.float32),  # ctx staging
            pltpu.VMEM((NWL, d), jnp.float32),  # dphi updates
            pltpu.VMEM((NWL, d), jnp.float32),  # dctx updates
            pltpu.VMEM((KP, d), jnp.float32),  # pool staging
            pltpu.VMEM((KP, d), jnp.float32),  # pool gradient
            pltpu.VMEM((NWL, d), jnp.uint32),  # SR draws
            pltpu.SMEM((1, 2), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ] + ([
            pltpu.SMEM((NWL,), jnp.int32),        # generated walk slots
            pltpu.VMEM(gen_indices.shape, jnp.int32),
        ] if gen else []),
    )
    new_in, new_out, stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(tshape, tdt),
            jax.ShapeDtypeStruct(tshape, tdt),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        walks_flat,
        sneg_g.astype(jnp.int32).reshape(n_pools * KPp),
        scal,
        emb_in_k,
        emb_out_k,
        *([
            jax.lax.bitcast_convert_type(
                gen_bits, jnp.int32
            ).reshape(G * NWL),
            gen_indptr.astype(jnp.int32),
            gen_deg.astype(jnp.int32),
            gen_indices.astype(jnp.int32),
        ] if gen else []),
    )
    if tables_bf16:

        def _unpack(pk):
            lo = jax.lax.bitcast_convert_type(
                (pk & jnp.uint32(M_LO)).astype(jnp.uint16), jnp.bfloat16
            )
            hi = jax.lax.bitcast_convert_type(
                (pk >> jnp.uint32(16)).astype(jnp.uint16), jnp.bfloat16
            )
            return jnp.stack([lo, hi], axis=1).reshape(Vp, d)[:V]

        new_in, new_out = _unpack(new_in), _unpack(new_out)
    return new_in, new_out, stats[0, 0], stats[0, 1]


def pack_csr_2d(indptr, indices):
    """Pad CSR arrays to [*, 128] i32 for the in-kernel walk generator
    (dynamic-ROW addressable in VMEM; lanes picked by one-hot reduce)."""
    import numpy as np

    def to2d(a):
        a = np.asarray(a, np.int32)
        rows = max(1, -(-len(a) // 128))
        out = np.zeros((rows * 128,), np.int32)
        out[: len(a)] = a
        return out.reshape(rows, 128)

    return to2d(indptr), to2d(indices)


def pack_csr_gen(indptr, indices):
    """CSR layout for the in-kernel walk generator: row offsets and degrees
    as FLAT i32 arrays (SMEM-resident — direct scalar loads in the kernel),
    neighbor lists padded to [*, 128] (VMEM, one-hot lane extraction).
    1-D s32 operands carry XLA layout T(1024), so the flat arrays pad to a
    1024 multiple."""
    import numpy as np

    ip = np.asarray(indptr, np.int32)
    dg = (ip[1:] - ip[:-1]).astype(np.int32)

    def flat(a):
        n = max(1024, -(-len(a) // 1024) * 1024)
        out = np.zeros((n,), np.int32)
        out[: len(a)] = a
        return out

    ix = np.asarray(indices, np.int32)
    rows = max(1, -(-len(ix) // 128))
    ix2 = np.zeros((rows * 128,), np.int32)
    ix2[: len(ix)] = ix
    return flat(ip[:-1]), flat(dg), ix2.reshape(rows, 128)


def fused_walk_sgns_gen_step(
    emb_in,
    emb_out,
    starts,       # [B] i32 walk origins
    bits,         # [G, NWL] random u32/i32 (host threefry), G = ceil(B/NW)
    indptr1d,     # [Vp1] i32 (pack_csr_gen; SMEM-resident row offsets)
    deg1d,        # [Vp1] i32 (pack_csr_gen; SMEM-resident degrees)
    indices2d,    # [Re, 128] i32 (VMEM neighbor lists)
    shared_negs,
    lr,
    negative_weight,
    seed,
    *,
    walk_length: int,
    window: int = 10,
    column_block: int = 256,
    interpret: bool = False,
    reduced_window: bool = True,
    mxu_bf16: bool = False,
    pool_refresh: int = 1,
):
    """O1 macro step with IN-KERNEL walk generation (VERDICT r2 item 5).

    The kernel generates each group's walks right before staging, so there
    is no separate walker scan at all — walk generation rides the same
    grid step as the SGNS math.  CSR offsets/degrees are SMEM-resident
    (direct scalar loads), neighbor lists VMEM-resident (one-hot lane
    extraction over [*, 128] rows), and the NW walk chains advance in
    lockstep so their loads pipeline.  Randomness arrives as an input bit
    matrix (one host threefry call per macro step), which keeps compiled
    and interpreted runs bit-comparable and the walk stream reproducible
    in numpy (the parity tests regenerate walks from the same bits).
    """
    starts = starts.astype(jnp.int32)
    walks = jnp.zeros(
        (starts.shape[0], walk_length), jnp.int32
    ).at[:, 0].set(starts)
    return fused_walk_sgns_step(
        emb_in, emb_out, walks, shared_negs, lr, negative_weight, seed,
        window=window, column_block=column_block, interpret=interpret,
        reduced_window=reduced_window, mxu_bf16=mxu_bf16,
        pool_refresh=pool_refresh,
        gen_bits=bits, gen_indptr=indptr1d, gen_deg=deg1d,
        gen_indices=indices2d,
    )
