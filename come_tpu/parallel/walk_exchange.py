"""Row-sharded (model-parallel) tier of the walk-banded fused kernel.

The fused kernel (ops/pallas_walk_sgns.py) needs its tables in VMEM, which
caps V at ~196k rows per chip.  This tier removes the cap: the tables stay
ROW-SHARDED over the 'model' axis (each chip owns V/M rows in HBM), and each
macro step materializes only the rows that step actually touches:

  1. ids     = the step's walk slots + its negative pools (per worker)
  2. uq      = sorted unique ids (static capacity = the id count — exact)
  3. gather  = bucketed all-to-all row exchange (parallel/exchange.py):
               owners answer requests over ICI, ~3*U*d/M bytes per device
  4. kernel  = the unchanged fused kernel over the COMPACT [U, d] tables
               with walks/pools remapped to compact slots (searchsorted)
  5. scatter = delta rows (new - old compact rows) ride the same buckets
               back to their owners, then partial deltas psum over 'data'

Exchange/compute overlap (BASELINE.json:5 "exchanged all-to-all over ICI,
OVERLAPPED with the SpMM-style aggregation and gradient scatter-add"):

  * ids are param-independent, so steps 1–2 and the id half of step 3 are
    HOISTED out of the training loop for every macro step / block at once
    (``plan_walk_macro_steps`` → ``make_exchange_plans_batched``: one
    batched all-to-all instead of one per step);
  * with ``overlap=True`` the ROW gather for step k+1 is issued before
    step k's update lands (double buffering through the scan carry), so
    XLA's async collectives run it while step k's kernel computes.  The
    prefetched rows are one step stale — the same staleness class as the
    reference's hogwild reads (SURVEY.md §3.2), and the delta routed back
    is relative to the worker's own gathered base, so sum-of-deltas
    consistency is unaffected.

Semantics: one macro step is synchronous across all D*M workers
(sum-of-deltas, the same envelope as the data-parallel tier); within the
step the kernel's group-sequential hogwild-style updates apply to the
worker's private compact copy.  Bucket overflow (ids beyond an owner's
static capacity) leaves those rows zero and drops their delta — equivalent
to skipping the affected pairs for one step; with the trainer's id
interleave (exchange.interleave_permutation) and the default 2x slack this
~never fires, and the served fraction is returned for monitoring.

Replaces: the reference's hogwild threads sharing one in-RAM table
(SURVEY.md §3.2) — here the "table" is the union of the mesh's HBM shards
and the "shared memory" is the ICI all-to-all.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from come_tpu.parallel.exchange import (
    RowExchangePlan,
    make_exchange_plans_batched,
    shift_plans,
)


def prefetch_scan(plans, xs, carry0, gather, step, overlap: bool):
    """Scan macro steps with optional one-step row prefetch — THE shared
    double-buffer pattern of every row-sharded tier (O1 kernel, O2 paired
    kernel, banded blocks), so a fix to the pipelining applies everywhere.

    ``plans``: batched RowExchangePlan (leading scan dim on every leaf).
    ``xs``: tuple of per-step scan inputs.
    ``gather(carry, plan) -> rows``: fetch the step's rows (any pytree)
    from the CURRENT carry's tables.
    ``step(carry, rows, plan, xs_k) -> (carry, out)``: apply one macro
    step.

    With ``overlap`` the NEXT step's rows are gathered BEFORE the current
    step's update lands (double buffering through the scan carry): the
    gather has no data dependency on the step's compute, so on TPU the
    a2a rides the async collective engines under the kernel.  Prefetched
    rows are one step stale — hogwild-class; callers' deltas are relative
    to the gathered base, so sum-of-deltas consistency is unaffected.
    """
    if overlap:
        plan0 = jax.tree.map(lambda a: a[0], plans)
        rows0 = gather(carry0, plan0)

        def body(c, x):
            carry, rows = c
            plan_cur, plan_next, xs_k = x
            nrows = gather(carry, plan_next)
            carry, out = step(carry, rows, plan_cur, xs_k)
            return (carry, nrows), out

        (carry, _), outs = jax.lax.scan(
            body, (carry0, rows0), (plans, shift_plans(plans), xs)
        )
    else:

        def body(carry, x):
            plan, xs_k = x
            rows = gather(carry, plan)
            return step(carry, rows, plan, xs_k)

        carry, outs = jax.lax.scan(body, carry0, (plans, xs))
    return carry, outs


def plan_walk_macro_steps(
    walks_all: jnp.ndarray,  # [S, B_w, L] this worker's walks (GLOBAL ids)
    sneg_all: jnp.ndarray,   # [S, ...]    negative pools (GLOBAL ids)
    rows_per: int,
    capacity_slack: float,
    axis: str = "model",
):
    """Hoisted exchange planning for S macro steps (ONE id all-to-all).

    Returns (plans, rwalks, rneg, served): ``plans`` has a leading S dim on
    every leaf (scan xs); ``rwalks``/``rneg`` are the walks/pools remapped
    to compact row slots; ``served`` [S] is the per-step fraction of real
    unique ids that fit their owner's bucket.
    """
    S = walks_all.shape[0]
    M = jax.lax.axis_size(axis)
    v_pad = rows_per * M
    ids = jnp.concatenate(
        [walks_all.reshape(S, -1), sneg_all.reshape(S, -1)], axis=1
    ).astype(jnp.int32)
    U = ids.shape[1]  # unique count can never exceed this — exact capacity
    # fill = v_pad sorts after every real id (uq stays sorted for the
    # searchsorted remap) and is out of range for every shard, so fill
    # entries are dropped from the exchange without consuming bucket slots
    uq = jax.vmap(lambda i: jnp.unique(i, size=U, fill_value=v_pad))(ids)
    cap = max(1, int(math.ceil(U / M * capacity_slack)))
    plans = make_exchange_plans_batched(uq, rows_per, cap, axis)
    rwalks = (
        jax.vmap(jnp.searchsorted)(uq, walks_all.reshape(S, -1))
        .reshape(walks_all.shape)
        .astype(jnp.int32)
    )
    rneg = (
        jax.vmap(jnp.searchsorted)(uq, sneg_all.reshape(S, -1))
        .reshape(sneg_all.shape)
        .astype(jnp.int32)
    )
    # served over REAL unique ids only: fill entries (uq == v_pad) belong to
    # owner M whose clamped bucket start can mark them "served" and inflate
    # the metric whenever the batch has many duplicate ids
    real = uq < v_pad
    served = jnp.sum(
        (plans.served & real).astype(jnp.float32), axis=1
    ) / jnp.maximum(jnp.sum(real.astype(jnp.float32), axis=1), 1.0)
    return plans, rwalks, rneg, served


def fused_walk_step_prepped(
    node_shard: jnp.ndarray,
    ctx_shard: jnp.ndarray,
    rows_n: jnp.ndarray,   # [U, d] gathered compact node rows (may be stale)
    rows_c: jnp.ndarray,   # [U, d] gathered compact ctx rows
    plan: RowExchangePlan,
    rwalks: jnp.ndarray,   # [B_w, L] walks in COMPACT slots
    rneg: jnp.ndarray,     # [n_pools, KP] pools in COMPACT slots
    lr,
    negative_weight,
    seed,
    *,
    window: int,
    pool_refresh: int = 1,
    mxu_bf16: bool = False,
    interpret: bool = False,
    paired: bool = False,
):
    """Kernel + delta routing for one PREPPED macro step.

    Returns (dn, dc, loss, n_pairs): per-worker partial deltas for the
    owned row shards (NOT yet psum'd over 'data') and the worker-local
    loss/pair count.  The delta is relative to the gathered base rows, so
    prefetched (stale) rows stay sum-of-deltas consistent.

    ``paired=True`` is the O2 (edge) mode: ``rwalks`` rows carry edges
    interleaved [u0, v0, ...] in compact slots and the kernel trains
    exactly (u->v)+(v->u) per edge (reduced windows are meaningless —
    disabled).  For the TIED O2 tables pass the node shard/rows as BOTH
    the node and ctx arguments; the caller applies ``dn + dc`` to the one
    table (the same new_in + new_out - old composition as the single-chip
    paired path, trainer/come.py::_o2_epoch_kernel).
    """
    from come_tpu.ops.pallas_walk_sgns import fused_walk_sgns_step

    new_cn, new_cc, loss, npairs = fused_walk_sgns_step(
        rows_n, rows_c, rwalks, rneg, lr, negative_weight, seed,
        window=window, interpret=interpret,
        reduced_window=not interpret and not paired,
        mxu_bf16=mxu_bf16, pool_refresh=pool_refresh, paired=paired,
    )
    dn = plan.scatter_add(jnp.zeros_like(node_shard), new_cn - rows_n)
    dc = plan.scatter_add(jnp.zeros_like(ctx_shard), new_cc - rows_c)
    return dn, dc, loss, npairs


def fused_walk_step_rowsharded(
    node_shard: jnp.ndarray,   # [rows_per, d] this model shard's rows (f32)
    ctx_shard: jnp.ndarray,    # [rows_per, d]
    walks: jnp.ndarray,        # [B_w, L] this worker's walks (GLOBAL ids)
    sneg: jnp.ndarray,         # [n_pools, KP] negative pools (GLOBAL ids)
    lr,
    negative_weight,
    seed,
    *,
    window: int,
    capacity_slack: float = 2.0,
    pool_refresh: int = 1,
    mxu_bf16: bool = False,
    interpret: bool = False,
    axis: str = "model",
    data_axis: str = "data",
):
    """One SELF-CONTAINED O1 macro step on row-sharded tables (plan + gather
    + kernel + scatter, no pipelining).  Call inside shard_map.  The
    trainer's epoch loop uses the hoisted/overlapped form instead
    (``plan_walk_macro_steps`` + ``fused_walk_step_prepped``); this entry
    point remains the simple one-step API and the reference semantics for
    tests.

    Returns (node_shard', ctx_shard', loss, n_pairs, served_fraction):
    ``loss`` and ``n_pairs`` are psum'd over BOTH mesh axes (matching the
    delta treatment — callers divide loss by n_pairs directly), and
    ``served_fraction`` is this worker's fraction of real unique rows that
    fit their owner's bucket (fill entries excluded).  The table shards
    come back identical across the data axis (deltas psum'd).
    """
    plans, rwalks, rneg, served = plan_walk_macro_steps(
        walks[None], sneg[None], node_shard.shape[0], capacity_slack, axis
    )
    plan = jax.tree.map(lambda a: a[0], plans)
    rows_n = plan.gather(node_shard)  # [U, d]; unserved/fill rows are 0
    rows_c = plan.gather(ctx_shard)
    dn, dc, loss, npairs = fused_walk_step_prepped(
        node_shard, ctx_shard, rows_n, rows_c, plan,
        rwalks[0], rneg[0], lr, negative_weight, seed,
        window=window, pool_refresh=pool_refresh,
        mxu_bf16=mxu_bf16, interpret=interpret,
    )
    dn = jax.lax.psum(dn, data_axis)
    dc = jax.lax.psum(dc, data_axis)
    loss = jax.lax.psum(loss, (data_axis, axis))
    npairs = jax.lax.psum(npairs, (data_axis, axis))
    return node_shard + dn, ctx_shard + dc, loss, npairs, served[0]


def banded_walk_step_rowsharded(
    combo_shard: jnp.ndarray,  # [rows_per, 2d] packed node|ctx row shard
    walks: jnp.ndarray,        # [B_w, L] this worker's walks (GLOBAL ids)
    sneg: jnp.ndarray,         # [KP] negative pool (GLOBAL ids)
    lr,
    negative_weight,
    key: jax.Array,
    *,
    window: int,
    walk_block: int = 1024,
    capacity_slack: float = 2.0,
    mxu_bf16: bool = True,
    reduced_window: bool = True,
    overlap: bool = True,
    axis: str = "model",
    data_axis: str = "data",
):
    """One O1 macro step of the banded-XLA tier on row-sharded PACKED tables.

    This is the large-V form of :func:`fused_walk_step_rowsharded`: same
    bucketed-a2a row exchange, but the SGNS math is the XLA banded
    formulation (losses/sgns_banded.py) over compact [U, 2d] row sets, so
    there is NO VMEM residency constraint at all — the only per-step
    footprint is the block's own rows.  This is the tier that carries
    BASELINE config 5 (synthetic-10m, V >= 500k) under the mesh.

    Blocks of ``walk_block`` walks run sequentially; every block's id
    exchange is hoisted and batched before the loop, and with
    ``overlap=True`` block k+1's rows are gathered (one block stale) while
    block k computes — see the module docstring.  Each block accumulates
    its delta LOCALLY (gathers read shard + own accumulated delta, the
    per-worker hogwild envelope); the accumulated delta psums over 'data'
    ONCE per macro step so the full-shard collective amortizes over all
    blocks.

    Returns (combo_shard', loss, n_pairs, served_fraction); loss/n_pairs
    are psum'd over BOTH mesh axes.
    """
    from come_tpu.losses.sgns_banded import banded_block_grads

    rows_per, dd = combo_shard.shape
    d = dd // 2
    B, L = walks.shape
    Bc = min(walk_block, B)
    G = -(-B // Bc)
    if G * Bc != B:
        walks = jnp.resize(walks, (G * Bc, L))  # wrap tail with real walks
    walks_g = walks.reshape(G, Bc, L).astype(jnp.int32)
    kw, _ = jax.random.split(key)
    if reduced_window:
        wrows = jax.random.randint(
            kw, (G, Bc, L), 1, window + 1, dtype=jnp.int32
        )
    else:
        wrows = jnp.full((G, Bc, L), window, jnp.int32)
    pool = sneg.reshape(-1).astype(jnp.int32)
    KP = pool.shape[0]
    lr = jnp.asarray(lr, jnp.float32)
    U = Bc * L + KP

    # hoisted id exchange for every block at once
    pool_g = jnp.broadcast_to(pool, (G, KP))
    plans, rw, rp, served_g = plan_walk_macro_steps(
        walks_g, pool_g, rows_per, capacity_slack, axis
    )

    def compute(rows, rw_k, rp_k, wr):
        prow = jnp.take(rows, rw_k.reshape(-1), axis=0).reshape(
            Bc, L, 2 * d
        )
        phi = prow[:, :, :d]
        ctx = prow[:, :, d:]
        cneg = jnp.take(rows, rp_k, axis=0)[:, d:]
        loss, npairs, (d_phi, d_ctx, d_cneg) = banded_block_grads(
            phi, ctx, cneg, wr, negative_weight, mxu_bf16=mxu_bf16
        )
        # combine duplicate slots per COMPACT row, then route once
        upd = jnp.zeros((U, 2 * d), jnp.float32)
        upd = upd.at[rw_k.reshape(-1)].add(
            jnp.concatenate([d_phi, d_ctx], axis=-1).reshape(
                Bc * L, 2 * d
            )
        )
        upd = upd.at[rp_k].add(
            jnp.concatenate([jnp.zeros_like(d_cneg), d_cneg], axis=-1)
        )
        return upd, loss, npairs

    delta0 = jnp.zeros_like(combo_shard)
    rw_b = rw.reshape(G, Bc, L)

    def gather(delta, plan):
        # blocks accumulate their delta LOCALLY: gathers read shard + own
        # accumulated delta (the per-worker hogwild envelope)
        return plan.gather(combo_shard + delta)

    def block(delta, rows, plan, xs_k):
        rw_k, rp_k, wr = xs_k
        upd, loss, npairs = compute(rows, rw_k, rp_k, wr)
        delta = plan.scatter_add(delta, upd * (-lr))
        return delta, (loss, npairs)

    delta, (losses, npairs) = prefetch_scan(
        plans, (rw_b, rp, wrows), delta0, gather, block, overlap
    )

    combo = combo_shard + jax.lax.psum(delta, data_axis)
    loss = jax.lax.psum(jnp.sum(losses), (data_axis, axis))
    npair = jax.lax.psum(jnp.sum(npairs), (data_axis, axis))
    return combo, loss, npair, jnp.mean(served_g)
