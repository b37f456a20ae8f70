"""Pallas TPU kernel: fused SGNS micro-step with VMEM-resident tables.

This is the speed-of-light replacement for the reference's Cython inner loop
(``utils/training_sdg_inner.pyx`` [R], SURVEY.md C1) on graphs whose tables
fit in VMEM (V*d*4B <= ~6 MB per table, e.g. BlogCatalog at d=128).  The XLA
path streams both tables from HBM for every gather/scatter — random 512 B
row accesses at poor DRAM efficiency; here both tables are pinned in VMEM
for the whole micro-step, so row traffic runs at VMEM bandwidth and the
negative scoring runs on the MXU:

  grid step = one tile of TP pairs (sequential on TPU, so tile t+1 sees
  tile t's updates — closer to the reference's sequential hogwild than the
  XLA micro-batch path):
    1. gather   phi[TP,d], cpos[TP,d] rows from the VMEM tables (and
                materialize the pair mask from SMEM in the same loop)
    2. scores   pos: rowwise dot (VPU); neg: phi @ Cneg^T (MXU) against a
                shared pool of KP negative rows staged into scratch once
    3. grads    word2vec SGNS gradients (losses/sgns_block.py math)
    4. scatter  read-modify-write phi/cpos rows back one-by-one (exact
                duplicate accumulation); the dense negative-pool gradient
                accumulates in scratch and is applied on the last tile

Semantics: pairs update synchronously within a TP-tile and sequentially
across tiles; the shared-negative rows accumulate their gradient over the
whole micro-step and apply once at the end (documented divergence from the
per-pair reference; quality validated end-to-end).

Mosaic layout note: 1-D s32 inputs carry XLA layout T(1024), so index/mask
operands are blocked at 1024 — the tile size is fixed at TP=1024.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 1-D s32/f32 operands get XLA layout T(1024); SMEM blocks must match it.
TILE_PAIRS = 1024


def _gather_masked(emb_in, emb_out, c_ref, x_ref, mask_ref, a_ref, b_ref, TP):
    """Stage phi/cpos rows into scratch; masked pairs get a ZEROED phi row.

    Mosaic forbids scalar stores to VMEM, so the mask can't be materialized
    as an f32 column.  Instead the mask acts through the math: phi = 0 makes
    every masked-pair gradient that *leaves* the pair zero (d_cpos = g*phi,
    d_cneg += g x phi), and the remaining self-updates (d_phi) are masked at
    scatter time by the same scalar.  The only residue is a CONSTANT loss
    term ln2 * (1 + negw*KP) per masked pair, corrected by the host wrapper.
    """

    U = 8  # static unroll: the loops are scalar-issue bound

    def g(tu, _):
        base = tu * U
        for j in range(U):
            t = base + j
            w = jnp.where(mask_ref[t] != 0, 1.0, 0.0)
            a_ref[t, :] = emb_in[c_ref[t], :] * w
            b_ref[t, :] = emb_out[x_ref[t], :]
        return 0

    jax.lax.fori_loop(0, TP // U, g, 0)


def _sgns_tile_math(phi, cpos, cneg, negw):
    """SGNS math on staged rows -> (d_phi, d_cpos, d_cneg, loss).

    Mask handling lives in :func:`_gather_masked` (phi zeroed) + the
    scatter-time scalar; no mask vector exists in the kernel.
    """
    spos = jnp.sum(phi * cpos, axis=1, keepdims=True)  # [TP, 1] (VPU)
    sneg = jax.lax.dot_general(
        phi, cneg,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TP, KP] (MXU)
    gpos = jax.nn.sigmoid(spos) - 1.0
    gneg = jax.nn.sigmoid(sneg) * negw
    loss = -(
        jnp.sum(jax.nn.log_sigmoid(spos))
        + negw * jnp.sum(jax.nn.log_sigmoid(-sneg))
    )
    d_phi = gpos * cpos + jnp.dot(
        gneg, cneg, preferred_element_type=jnp.float32
    )
    d_cpos = gpos * phi
    d_cneg = jax.lax.dot_general(
        gneg, phi,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return d_phi, d_cpos, d_cneg, loss


def _fused_kernel(
    sneg_ref,  # [KP] int32 (scalar prefetch, SMEM)
    c_ref,  # [TP] int32 (SMEM)
    x_ref,  # [TP] int32 (SMEM)
    mask_ref,  # [TP] int32 (SMEM)
    scal_ref,  # [1, 2] f32 (SMEM): lr, negative_weight
    emb_in_hbm,  # [V, d] HBM (ANY): DMA'd into the VMEM buffer at i == 0
    emb_out_hbm,
    emb_in_out,  # [V, d] VMEM working table (aliased output)
    emb_out_out,  # [V, d] VMEM
    loss_ref,  # [1, 1] f32 (SMEM out)
    a_ref,  # [TP, d]
    b_ref,  # [TP, d]
    cneg_ref,  # [KP, d]
    dneg_ref,  # [KP, d]
    acc_ref,  # [1, 1]
    dma_sem,
    *,
    TP: int,
    KP: int,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    lr = scal_ref[0, 0]
    negw = scal_ref[0, 1]

    @pl.when(i == 0)
    def _init():
        acc_ref[0, 0] = 0.0
        # explicit HBM -> VMEM table init: aliased whole-array VMEM output
        # refs are not reliably input-initialized (see pallas_walk_sgns),
        # and ANY-space inputs halve the kernel's VMEM demand
        cp = pltpu.make_async_copy(emb_in_hbm, emb_in_out, dma_sem)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(emb_out_hbm, emb_out_out, dma_sem)
        cp.start()
        cp.wait()

        def g(k, _):
            cneg_ref[k, :] = emb_out_out[sneg_ref[k], :]
            return 0

        jax.lax.fori_loop(0, KP, g, 0)
        dneg_ref[:, :] = jnp.zeros_like(dneg_ref)

    _gather_masked(
        emb_in_out, emb_out_out, c_ref, x_ref, mask_ref, a_ref, b_ref, TP
    )
    d_phi, d_cpos, d_cneg, loss = _sgns_tile_math(
        a_ref[:, :], b_ref[:, :], cneg_ref[:, :], negw
    )
    acc_ref[0, 0] += loss
    dneg_ref[:, :] += d_cneg
    a_ref[:, :] = d_phi * (-lr)
    b_ref[:, :] = d_cpos * (-lr)

    U = 8

    def scatter(tu, _):
        # d_phi is nonzero even for masked pairs -> gate by the mask scalar;
        # d_cpos is already zero for them (phi row was zeroed at gather)
        base = tu * U
        for j in range(U):
            t = base + j
            w = jnp.where(mask_ref[t] != 0, 1.0, 0.0)
            ci = c_ref[t]
            emb_in_out[ci, :] = emb_in_out[ci, :] + a_ref[t, :] * w
            xi = x_ref[t]
            emb_out_out[xi, :] = emb_out_out[xi, :] + b_ref[t, :]
        return 0

    jax.lax.fori_loop(0, TP // U, scatter, 0)

    @pl.when(i == n - 1)
    def _finish():
        def s(k, _):
            nk = sneg_ref[k]
            emb_out_out[nk, :] = emb_out_out[nk, :] - lr * dneg_ref[k, :]
            return 0

        jax.lax.fori_loop(0, KP, s, 0)
        loss_ref[0, 0] = acc_ref[0, 0]


def _fused_tied_kernel(
    sneg_ref,
    c_ref,
    x_ref,
    mask_ref,
    scal_ref,
    emb_hbm,  # [V, d] HBM (ANY)
    emb_out,  # single working table (VMEM, aliased output)
    loss_ref,
    a_ref,
    b_ref,
    cneg_ref,
    dneg_ref,
    acc_ref,
    dma_sem,
    *,
    TP: int,
    KP: int,
):
    """O2 variant: both endpoints and the negative pool live in ONE table
    (reference Node2Vec.train, SURVEY.md C7).  Within a tile, each pair's
    c-row update applies before its x-row update."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    lr = scal_ref[0, 0]
    negw = scal_ref[0, 1]

    @pl.when(i == 0)
    def _init():
        acc_ref[0, 0] = 0.0
        cp = pltpu.make_async_copy(emb_hbm, emb_out, dma_sem)
        cp.start()
        cp.wait()

        def g(k, _):
            cneg_ref[k, :] = emb_out[sneg_ref[k], :]
            return 0

        jax.lax.fori_loop(0, KP, g, 0)
        dneg_ref[:, :] = jnp.zeros_like(dneg_ref)

    _gather_masked(
        emb_out, emb_out, c_ref, x_ref, mask_ref, a_ref, b_ref, TP
    )
    d_phi, d_cpos, d_cneg, loss = _sgns_tile_math(
        a_ref[:, :], b_ref[:, :], cneg_ref[:, :], negw
    )
    acc_ref[0, 0] += loss
    dneg_ref[:, :] += d_cneg
    a_ref[:, :] = d_phi * (-lr)
    b_ref[:, :] = d_cpos * (-lr)

    U = 8

    def scatter(tu, _):
        base = tu * U
        for j in range(U):
            t = base + j
            w = jnp.where(mask_ref[t] != 0, 1.0, 0.0)
            ci = c_ref[t]
            emb_out[ci, :] = emb_out[ci, :] + a_ref[t, :] * w
            xi = x_ref[t]
            emb_out[xi, :] = emb_out[xi, :] + b_ref[t, :]
        return 0

    jax.lax.fori_loop(0, TP // U, scatter, 0)

    @pl.when(i == n - 1)
    def _finish():
        def s(k, _):
            nk = sneg_ref[k]
            emb_out[nk, :] = emb_out[nk, :] - lr * dneg_ref[k, :]
            return 0

        jax.lax.fori_loop(0, KP, s, 0)
        loss_ref[0, 0] = acc_ref[0, 0]


def _prep(centers, contexts, mask, lr, negative_weight, TP):
    P = centers.shape[0]
    n_tiles = -(-P // TP)
    pad = n_tiles * TP - P
    if pad:
        centers = jnp.pad(centers, (0, pad))
        contexts = jnp.pad(contexts, (0, pad))
        mask = jnp.pad(mask, (0, pad))
    maski = mask.astype(jnp.int32)
    scal = jnp.stack(
        [jnp.asarray(lr, jnp.float32),
         jnp.asarray(negative_weight, jnp.float32)]
    ).reshape(1, 2)
    return centers.astype(jnp.int32), contexts.astype(jnp.int32), maski, scal, n_tiles


def _common_specs(TP):
    return [
        pl.BlockSpec((TP,), lambda i, _s: (i,), memory_space=pltpu.SMEM),
        pl.BlockSpec((TP,), lambda i, _s: (i,), memory_space=pltpu.SMEM),
        pl.BlockSpec((TP,), lambda i, _s: (i,), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda i, _s: (0, 0), memory_space=pltpu.SMEM),
    ]


_LN2 = 0.6931471805599453


def _scratch(TP, KP, d):
    return [
        pltpu.VMEM((TP, d), jnp.float32),
        pltpu.VMEM((TP, d), jnp.float32),
        pltpu.VMEM((KP, d), jnp.float32),
        pltpu.VMEM((KP, d), jnp.float32),
        pltpu.SMEM((1, 1), jnp.float32),
        pltpu.SemaphoreType.DMA,
    ]


def _loss_correction(maski, n_padded, negative_weight, KP):
    """Masked pairs contribute exactly ln2*(1 + negw*KP) each (phi zeroed ->
    all scores 0); subtract that constant from the kernel's raw loss."""
    n_masked = n_padded - jnp.sum(maski).astype(jnp.float32)
    return _LN2 * (1.0 + negative_weight * KP) * n_masked


@functools.partial(
    jax.jit, static_argnames=("tile_pairs", "tie_tables", "interpret")
)
def fused_sgns_step(
    emb_in: jnp.ndarray,
    emb_out: jnp.ndarray,
    centers: jnp.ndarray,
    contexts: jnp.ndarray,
    shared_negs: jnp.ndarray,
    mask: jnp.ndarray,
    lr,
    negative_weight,
    tile_pairs: int = TILE_PAIRS,
    tie_tables: bool = False,
    interpret: bool = False,
):
    """Run the fused kernel over a micro-batch of P pairs.

    Args:
      emb_in/emb_out: [V, d] tables (d a multiple of 128; V*d*4B within
        VMEM).  For O2 use :func:`fused_sgns_step_tied`.
      centers/contexts: int32 [P]; shared_negs: int32 [KP]; mask: [P].
      tile_pairs: pairs per grid step (1024 on hardware — Mosaic layout).

    Returns (emb_in', emb_out', loss).  P is padded to tile_pairs with
    masked no-op pairs.
    """
    if tie_tables:
        raise NotImplementedError("use fused_sgns_step_tied for O2")
    TP = tile_pairs
    KP = shared_negs.shape[0]
    V, d = emb_in.shape
    centers, contexts, maski, scal, n_tiles = _prep(
        centers, contexts, mask, lr, negative_weight, TP
    )
    kernel = functools.partial(_fused_kernel, TP=TP, KP=KP)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=_common_specs(TP)
        + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=_scratch(TP, KP, d),
    )
    new_in, new_out, loss = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((V, d), jnp.float32),
            jax.ShapeDtypeStruct((V, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
        # raise the scoped-VMEM cap: both tables + scratch exceed the 16MB
        # default when XLA fails to alias the in/out table buffers
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        shared_negs.astype(jnp.int32),
        centers,
        contexts,
        maski,
        scal,
        emb_in,
        emb_out,
    )
    corr = _loss_correction(maski, n_tiles * TP, negative_weight, KP)
    return new_in, new_out, loss[0, 0] - corr


@functools.partial(jax.jit, static_argnames=("tile_pairs", "interpret"))
def fused_sgns_step_tied(
    emb: jnp.ndarray,
    centers: jnp.ndarray,
    contexts: jnp.ndarray,
    shared_negs: jnp.ndarray,
    mask: jnp.ndarray,
    lr,
    negative_weight,
    tile_pairs: int = TILE_PAIRS,
    interpret: bool = False,
):
    """Single-table (O2) fused step.  Returns (emb', loss)."""
    TP = tile_pairs
    KP = shared_negs.shape[0]
    V, d = emb.shape
    centers, contexts, maski, scal, n_tiles = _prep(
        centers, contexts, mask, lr, negative_weight, TP
    )
    kernel = functools.partial(_fused_tied_kernel, TP=TP, KP=KP)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=_common_specs(TP)
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=_scratch(TP, KP, d),
    )
    new_emb, loss = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((V, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        input_output_aliases={5: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        shared_negs.astype(jnp.int32),
        centers,
        contexts,
        maski,
        scal,
        emb,
    )
    corr = _loss_correction(maski, n_tiles * TP, negative_weight, KP)
    return new_emb, loss[0, 0] - corr
