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


def main():
    import traceback

    configs = [
        ("pallas-tp1024", dict(pallas="auto", pallas_tile_pairs=1024)),
        ("pallas-kp512", dict(pallas="auto", pallas_tile_pairs=1024,
                              shared_negatives=512)),
        ("pallas-kp2048", dict(pallas="auto", pallas_tile_pairs=1024,
                               shared_negatives=2048)),
        ("xla-block", dict(pallas="never")),
        ("pallas-bp524288", dict(pallas="auto", pallas_tile_pairs=1024,
                                 batch_pairs=524288)),
    ]
    for name, kw in configs:
        try:
            bench(name, **kw)
        except Exception:
            print(f"FAILED {name}", flush=True)
            traceback.print_exc()



if __name__ == "__main__":
    main()
