"""Per-phase timing probe at the bench config (run on the real chip).

Times GMM fit / O1 / O2 / O3 / walker separately so the full-loop number
in bench.py can be attributed (VERDICT r2 next-round item 2).
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timed(fn, sync, n=3):
    fn()  # compile/warm
    sync()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    sync()
    return (time.perf_counter() - t0) / n


def main() -> int:
    import jax

    from come_tpu.config import get_config
    from come_tpu.graphs import get_dataset
    from come_tpu.trainer import ComETrainer

    print("backend:", jax.default_backend())
    ds = get_dataset("blogcatalog")
    base = get_config("blogcatalog").replace(
        num_communities=ds.num_communities,
        negative_mode="shared", shared_negatives=512, pallas="auto",
        walk_kernel_bf16=True, walk_pool_refresh=8,
        batch_walks=2048, batch_pairs=131072, walks_per_node=2,
        walk_regen_epochs=1,
    )
    t = ComETrainer(ds.graph, base)
    t.stats_sync(False)

    def sync():
        float(t.state.params.node_emb[0, 0])

    dt_o1 = timed(t.o1_epoch, lambda: (t.o1_sync(), sync()))
    dt_o2 = timed(t.o2_epoch, lambda: (t.o2_sync(), sync()))
    dt_gmm = timed(t.fit_gmm, sync)
    dt_o3 = timed(t.o3_pass, sync)

    # walker alone
    import jax.numpy as jnp

    v = ds.graph.num_nodes
    S = -(-v * base.walks_per_node // base.batch_walks)
    perm = jnp.resize(
        jnp.arange(v * base.walks_per_node, dtype=jnp.int32) % v,
        (S, base.batch_walks),
    )
    k = jax.random.key(0)
    t._gen_walks_jit(k, perm).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        w = t._gen_walks_jit(k, perm)
    jax.block_until_ready(w)
    dt_walk = (time.perf_counter() - t0) / 3

    pairs = t.last_o1_pairs
    o2p = t.last_o2_pairs
    total = dt_gmm + dt_o1 + dt_o2 + dt_o3
    print(
        f"gmm={dt_gmm * 1e3:.1f}ms o1={dt_o1 * 1e3:.1f}ms "
        f"o2={dt_o2 * 1e3:.1f}ms o3={dt_o3 * 1e3:.1f}ms "
        f"walker={dt_walk * 1e3:.1f}ms full={total * 1e3:.1f}ms"
    )
    print(
        f"o1_pairs={pairs:.0f} ({pairs / dt_o1 / 1e6:.1f} M/s) "
        f"o2_pairs={o2p:.0f} ({o2p / dt_o2 / 1e6:.1f} M/s) "
        f"full_loop={(pairs + o2p) / total / 1e6:.1f} M/s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
