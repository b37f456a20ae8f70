"""Dev benchmark matrix: O1 epoch throughput across configs (TPU).

Run detached:  setsid nohup python scripts/bench_matrix.py > /tmp/benchmx.log 2>&1 &
Results append to the log as JSON lines, one per config, as they finish.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench_config(name: str, **overrides):
    import jax

    from come_tpu.config import get_config
    from come_tpu.graphs import get_dataset
    from come_tpu.sampling import random_walks, skipgram_pairs
    from come_tpu.trainer import ComETrainer

    ds = get_dataset("blogcatalog")
    cfg = get_config("blogcatalog").replace(
        num_communities=ds.num_communities,
        walks_per_node=2,
        **overrides,
    )
    t = ComETrainer(ds.graph, cfg)
    t0 = time.perf_counter()
    t.o1_epoch()  # compile + warm
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        t.o1_epoch()
        times.append(time.perf_counter() - t0)

    import jax.numpy as jnp

    key = jax.random.key(123)
    starts = jnp.arange(min(cfg.batch_walks, ds.graph.num_nodes), dtype=jnp.int32)
    walks = random_walks(t.csr, starts, cfg.walk_length, key)
    _, _, m = skipgram_pairs(walks, cfg.window, jax.random.key(7))
    mask_rate = float(m.mean())
    n_starts = ds.graph.num_nodes * cfg.walks_per_node
    pairs = n_starts * cfg.walk_length * 2 * cfg.window * mask_rate
    rate = pairs / min(times)
    print(
        json.dumps(
            dict(
                name=name,
                rate_mpairs=round(rate / 1e6, 2),
                epoch_s=round(min(times), 2),
                compile_s=round(compile_s, 1),
                **overrides,
            )
        ),
        flush=True,
    )
    del t


def main():
    bench_config("shared1024", negative_mode="shared", shared_negatives=1024,
                 batch_walks=512, batch_pairs=131072)
    bench_config("shared1024-big", negative_mode="shared",
                 shared_negatives=1024, batch_walks=1024, batch_pairs=262144)
    bench_config("perpair-big", negative_mode="per_pair",
                 batch_walks=1024, batch_pairs=262144)
    bench_config("shared256", negative_mode="shared", shared_negatives=256,
                 batch_walks=512, batch_pairs=131072)
    bench_config("perpair-base", negative_mode="per_pair",
                 batch_walks=512, batch_pairs=131072)


if __name__ == "__main__":
    main()
