"""TPU bench: fused Pallas SGNS kernel vs XLA block path (shared negatives).

Run detached; appends JSON lines as configs finish.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench(name, **overrides):
    import jax
    import jax.numpy as jnp

    from come_tpu.config import get_config
    from come_tpu.graphs import get_dataset
    from come_tpu.sampling import random_walks, skipgram_pairs
    from come_tpu.trainer import ComETrainer

    ds = get_dataset("blogcatalog")
    base = dict(
        num_communities=ds.num_communities,
        walks_per_node=2,
        negative_mode="shared",
        shared_negatives=1024,
        batch_walks=512,
        batch_pairs=131072,
    )
    base.update(overrides)
    cfg = get_config("blogcatalog").replace(**base)
    t = ComETrainer(ds.graph, cfg)
    t0 = time.perf_counter()
    t.o1_epoch()
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        t.o1_epoch()
        times.append(time.perf_counter() - t0)

    key = jax.random.key(123)
    starts = jnp.arange(min(cfg.batch_walks, ds.graph.num_nodes), dtype=jnp.int32)
    walks = random_walks(t.csr, starts, cfg.walk_length, key)
    _, _, m = skipgram_pairs(walks, cfg.window, jax.random.key(7))
    pairs = (
        ds.graph.num_nodes * cfg.walks_per_node * cfg.walk_length
        * 2 * cfg.window * float(m.mean())
    )
    print(
        json.dumps(
            dict(
                name=name,
                rate_mpairs=round(pairs / min(times) / 1e6, 2),
                epoch_s=round(min(times), 2),
                compile_s=round(compile_s, 1),
                **overrides,
            )
        ),
        flush=True,
    )
    del t


def bench_walks_only(batch_walks=512):
    """Time just the walk+pair generation for one epoch's volume."""
    import jax
    import jax.numpy as jnp

    from come_tpu.graphs import get_dataset
    from come_tpu.sampling import random_walks, skipgram_pairs

    ds = get_dataset("blogcatalog")
    csr = ds.graph.to_device()
    L, W = 80, 10
    n_starts = ds.graph.num_nodes * 2
    S = -(-n_starts // batch_walks)

    def epoch(key, starts):
        def body(k, st):
            k1, k2, k3 = jax.random.split(k, 3)
            walks = random_walks(csr, st, L, k1)
            c, x, m = skipgram_pairs(walks, W, k2)
            return k3, jnp.sum(m)

        def scan_body(carry, st):
            k, acc = carry
            k, s = body(k, st)
            return (k, acc + s), None

        (k, total), _ = jax.lax.scan(scan_body, (key, jnp.int32(0)), starts)
        return total

    starts = jnp.arange(S * batch_walks, dtype=jnp.int32).reshape(
        S, batch_walks
    ) % ds.graph.num_nodes
    f = jax.jit(epoch)
    t0 = time.perf_counter()
    total = int(f(jax.random.key(0), starts))
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(2):
        t0 = time.perf_counter()
        total = int(f(jax.random.key(i + 1), starts))
        times.append(time.perf_counter() - t0)
    print(
        json.dumps(
            dict(name="walks+pairs-only", epoch_s=round(min(times), 2),
                 pairs=total, compile_s=round(compile_s, 1),
                 rate_mpairs=round(total / min(times) / 1e6, 2))
        ),
        flush=True,
    )


def main():
    import traceback

    # pallas='auto' now routes O1 through the walk-banded kernel
    configs = [
        ("walk-kp512-bw512", dict(pallas="auto", shared_negatives=512,
                                  batch_walks=512)),
        ("walk-kp512-bw2048", dict(pallas="auto", shared_negatives=512,
                                   batch_walks=2048)),
        ("walk-kp1024-bw2048", dict(pallas="auto", shared_negatives=1024,
                                    batch_walks=2048)),
        ("walk-kp512-bw8192", dict(pallas="auto", shared_negatives=512,
                                   batch_walks=8192)),
        ("xla-block-control", dict(pallas="never")),
    ]
    try:
        bench_walks_only()
    except Exception:
        print("FAILED walks-only", flush=True)
        traceback.print_exc()
    for name, kw in configs:
        try:
            bench(name, **kw)
        except Exception:
            print(f"FAILED {name}", flush=True)
            traceback.print_exc()



if __name__ == "__main__":
    main()
