"""Large-V banded-tier bench: synthetic-10m (V=500k) — HBM-resident tables.

The fused VMEM kernels cap out at V ~ 196k @ d=128; this measures the
banded XLA tier (losses/sgns_banded.py) that carries BASELINE config 5.

  python scripts/bench_banded.py [--dataset synthetic-10m] [--compare-flat]
         [--blocks 256] [--pools 512] [--epochs 3]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def measured_pairs_per_epoch(t, cfg, ds):
    import jax
    import jax.numpy as jnp

    from come_tpu.sampling import random_walks, skipgram_pairs

    key = jax.random.key(123)
    starts = jnp.arange(
        min(cfg.batch_walks, ds.graph.num_nodes), dtype=jnp.int32
    )
    walks = random_walks(t.csr, starts, cfg.walk_length, key)
    _, _, m = skipgram_pairs(walks, cfg.window, jax.random.key(7))
    mask_rate = float(m.mean())
    n_starts = ds.graph.num_nodes * cfg.walks_per_node
    return n_starts * cfg.walk_length * 2 * cfg.window * mask_rate


def bench_config(ds, cfg, epochs):
    from come_tpu.trainer import ComETrainer

    t = ComETrainer(ds.graph, cfg)
    path = (
        "walk_kernel" if t._use_walk_kernel()
        else "banded" if t._use_banded()
        else "flat"
    )
    t0 = time.perf_counter()
    t.o1_epoch()
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(epochs):
        t0 = time.perf_counter()
        t.o1_epoch()
        times.append(time.perf_counter() - t0)
    pairs = measured_pairs_per_epoch(t, cfg, ds)
    return dict(
        path=path,
        epoch_s=round(min(times), 3),
        mpairs_per_s=round(pairs / min(times) / 1e6, 1),
        compile_s=round(compile_s, 1),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic-10m")
    ap.add_argument("--blocks", type=int, nargs="+", default=[256])
    ap.add_argument("--pools", type=int, nargs="+", default=[512])
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--walks-per-node", type=int, default=1)
    ap.add_argument("--compare-flat", action="store_true")
    ap.add_argument("--no-sorted-scatter", action="store_true")
    args = ap.parse_args()

    from come_tpu.config import get_config
    from come_tpu.graphs import get_dataset

    ds = get_dataset(args.dataset)
    base = get_config(args.dataset).replace(
        num_communities=ds.num_communities,
        negative_mode="shared",
        walk_kernel_bf16=True,
        walk_regen_epochs=0,  # cached corpus: time the SGD hot loop
        walks_per_node=args.walks_per_node,
        batch_walks=2048,
        pallas="never",  # V is beyond the VMEM tiers anyway
        banded_sorted_scatter=not args.no_sorted_scatter,
    )
    print(json.dumps(dict(
        name="setup", dataset=args.dataset, nodes=ds.graph.num_nodes,
        edges=ds.graph.num_edges,
    )), flush=True)

    for bc in args.blocks:
        for kp in args.pools:
            cfg = base.replace(
                banded="auto", banded_walk_block=bc, shared_negatives=kp
            )
            r = bench_config(ds, cfg, args.epochs)
            print(json.dumps(dict(name="banded", block=bc, pool=kp, **r)),
                  flush=True)

    if args.compare_flat:
        cfg = base.replace(banded="never", shared_negatives=args.pools[0])
        r = bench_config(ds, cfg, max(1, args.epochs - 2))
        print(json.dumps(dict(name="flat", **r)), flush=True)


if __name__ == "__main__":
    main()
