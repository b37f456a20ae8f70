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

    Returns (node_shard', ctx_shard', loss, n_pairs, served_fraction); the
    table shards come back identical across the data axis (deltas psum'd).
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
    served = jnp.mean(plan.served.astype(jnp.float32))
    return node_shard + dn, ctx_shard + dc, loss, npairs, served
