"""Flickr-scale (V=80k) walk-kernel bench: tables ~41MB each in VMEM."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from come_tpu.config import get_config
    from come_tpu.graphs import get_dataset
    from come_tpu.trainer import ComETrainer

    ds = get_dataset("flickr")
    cfg = get_config("flickr").replace(
        num_communities=ds.num_communities,
        walks_per_node=1,
        batch_walks=2048,
        shared_negatives=512,
    )
    t = ComETrainer(ds.graph, cfg)
    print(json.dumps(dict(name="flickr-setup",
                          nodes=ds.graph.num_nodes,
                          edges=ds.graph.num_edges,
                          walk_kernel=t._use_walk_kernel())), flush=True)
    t0 = time.perf_counter()
    t.o1_epoch()
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        t.o1_epoch()
        times.append(time.perf_counter() - t0)
    pairs = ds.graph.num_nodes * cfg.walks_per_node * cfg.walk_length \
        * (cfg.window + 1) / 2 * 0.85  # approx mask rate
    print(json.dumps(dict(
        name="flickr-o1",
        epoch_s=round(min(times), 2),
        approx_rate_mpairs=round(pairs / min(times) / 1e6, 1),
        compile_s=round(compile_s, 1),
    )), flush=True)
    l2 = None
    t0 = time.perf_counter()
    l2 = t.o2_epoch()
    print(json.dumps(dict(name="flickr-o2", first_epoch_s=round(
        time.perf_counter() - t0, 2), loss=float(l2))), flush=True)


if __name__ == "__main__":
    main()
