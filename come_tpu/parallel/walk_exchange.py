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

from come_tpu.parallel.exchange import make_exchange_plan


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
    """One O1 macro step on row-sharded tables.  Call inside shard_map.

    Returns (node_shard', ctx_shard', loss, n_pairs, served_fraction):
    ``loss`` and ``n_pairs`` are psum'd over BOTH mesh axes (matching the
    delta treatment — callers divide loss by n_pairs directly), and
    ``served_fraction`` is this worker's fraction of real unique rows that
    fit their owner's bucket (fill entries excluded).  The table shards
    come back identical across the data axis (deltas psum'd).
    """
    from come_tpu.ops.pallas_walk_sgns import fused_walk_sgns_step

    rows_per, d = node_shard.shape
    M = jax.lax.axis_size(axis)
    v_pad = rows_per * M

    ids = jnp.concatenate(
        [walks.reshape(-1), sneg.reshape(-1)]
    ).astype(jnp.int32)
    U = ids.shape[0]  # unique count can never exceed this — exact capacity
    # fill = v_pad sorts after every real id (uq stays sorted for the
    # searchsorted remap) and is out of range for every shard, so fill
    # entries are dropped from the exchange without consuming bucket slots
    uq = jnp.unique(ids, size=U, fill_value=v_pad)
    cap = max(1, int(math.ceil(U / M * capacity_slack)))
    plan = make_exchange_plan(uq, rows_per, cap, axis)
    cn = plan.gather(node_shard)  # [U, d]; unserved/fill rows are 0
    cc = plan.gather(ctx_shard)

    rwalks = jnp.searchsorted(uq, walks).astype(jnp.int32)
    rneg = jnp.searchsorted(uq, sneg).astype(jnp.int32)

    new_cn, new_cc, loss, npairs = fused_walk_sgns_step(
        cn, cc, rwalks, rneg, lr, negative_weight, seed,
        window=window, interpret=interpret,
        reduced_window=not interpret,
        mxu_bf16=mxu_bf16, pool_refresh=pool_refresh,
    )

    # route delta rows back to their owners (unserved entries dropped by the
    # plan — their pairs trained against zero rows and contributed ~nothing
    # to served rows), then sum partial deltas across every worker replica
    dn = plan.scatter_add(jnp.zeros_like(node_shard), new_cn - cn)
    dc = plan.scatter_add(jnp.zeros_like(ctx_shard), new_cc - cc)
    dn = jax.lax.psum(dn, data_axis)
    dc = jax.lax.psum(dc, data_axis)
    # served over REAL unique ids only: fill entries (uq == v_pad) belong to
    # owner M whose clamped bucket start can mark them "served" and inflate
    # the metric whenever the batch has many duplicate ids
    real = uq < v_pad
    served = jnp.sum((plan.served & real).astype(jnp.float32)) / jnp.maximum(
        jnp.sum(real.astype(jnp.float32)), 1.0
    )
    loss = jax.lax.psum(loss, (data_axis, axis))
    npairs = jax.lax.psum(npairs, (data_axis, axis))
    return node_shard + dn, ctx_shard + dc, loss, npairs, served


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

    Blocks of ``walk_block`` walks run sequentially; each block exchanges
    its rows over ICI and accumulates its delta LOCALLY (gathers read
    shard + own accumulated delta, the per-worker hogwild envelope); the
    accumulated delta psums over 'data' ONCE per macro step so the
    full-shard collective amortizes over all blocks.

    Returns (combo_shard', loss, n_pairs, served_fraction); loss/n_pairs
    are psum'd over BOTH mesh axes.
    """
    from come_tpu.losses.sgns_banded import banded_block_grads

    rows_per, dd = combo_shard.shape
    d = dd // 2
    M = jax.lax.axis_size(axis)
    v_pad = rows_per * M
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
    U = Bc * L + KP
    cap = max(1, int(math.ceil(U / M * capacity_slack)))
    lr = jnp.asarray(lr, jnp.float32)

    def block(delta, xs):
        w, wr = xs  # [Bc, L], [Bc, L]
        ids = jnp.concatenate([w.reshape(-1), pool])
        uq = jnp.unique(ids, size=U, fill_value=v_pad)
        plan = make_exchange_plan(uq, rows_per, cap, axis)
        rows = plan.gather(combo_shard + delta)  # [U, 2d]; unserved rows 0
        rw = jnp.searchsorted(uq, w.reshape(-1)).astype(jnp.int32)
        rp = jnp.searchsorted(uq, pool).astype(jnp.int32)
        prow = jnp.take(rows, rw, axis=0).reshape(Bc, L, 2 * d)
        phi = prow[:, :, :d]
        ctx = prow[:, :, d:]
        cneg = jnp.take(rows, rp, axis=0)[:, d:]
        loss, npairs, (d_phi, d_ctx, d_cneg) = banded_block_grads(
            phi, ctx, cneg, wr, negative_weight, mxu_bf16=mxu_bf16
        )
        # combine duplicate slots per COMPACT row, then route once
        upd = jnp.zeros((U, 2 * d), jnp.float32)
        upd = upd.at[rw].add(
            jnp.concatenate([d_phi, d_ctx], axis=-1).reshape(
                Bc * L, 2 * d
            )
        )
        upd = upd.at[rp].add(
            jnp.concatenate([jnp.zeros_like(d_cneg), d_cneg], axis=-1)
        )
        delta = plan.scatter_add(delta, upd * (-lr))
        real = uq < v_pad
        served = jnp.sum(
            (plan.served & real).astype(jnp.float32)
        ) / jnp.maximum(jnp.sum(real.astype(jnp.float32)), 1.0)
        return delta, (loss, npairs, served)

    delta0 = jnp.zeros_like(combo_shard)
    delta, (losses, npairs, srv) = jax.lax.scan(
        block, delta0, (walks_g, wrows)
    )
    combo = combo_shard + jax.lax.psum(delta, data_axis)
    loss = jax.lax.psum(jnp.sum(losses), (data_axis, axis))
    npair = jax.lax.psum(jnp.sum(npairs), (data_axis, axis))
    return combo, loss, npair, jnp.mean(srv)
