"""Multi-dataset evaluation sweep (BASELINE.json config 4).

Runs the full ComE loop on each dataset and reports community NMI and
node-classification macro/micro-F1 — the reference's §3.5 evaluation surface.

    python scripts/eval_sweep.py --datasets karate dblp --json out.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# this environment's axon sitecustomize pins jax_platforms in every
# interpreter, overriding the env var; honor an explicit JAX_PLATFORMS
# (the CPU virtual-mesh runs set it with
# XLA_FLAGS=--xla_force_host_platform_device_count=N)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def _heavy_tail_dataset():
    """dc-SBM stand-in with a power-law degree profile — the degree shape
    of the real BlogCatalog/Flickr graphs (SURVEY.md C13); stresses the
    hub-row collision envelope and the star tier's fan-out packing."""
    from come_tpu.graphs import dc_sbm_graph
    from come_tpu.graphs.datasets import Dataset

    g, labels = dc_sbm_graph(
        5000, 12, avg_degree=30.0, exponent=2.5, assortativity=25.0,
        seed=11,
    )
    return Dataset("heavy-tail-dcsbm", g, labels, 12)


def run_one(
    name: str,
    fast: bool,
    mesh_shape: tuple[int, int] | None,
    ratios: bool = False,
) -> dict:
    from come_tpu.config import PRESETS, ComEConfig
    from come_tpu.evaluation import node_classification_f1
    from come_tpu.graphs import get_dataset
    from come_tpu.trainer import ComETrainer

    if name == "heavy-tail-dcsbm":
        ds = _heavy_tail_dataset()
        cfg = PRESETS["blogcatalog"]
    else:
        ds = get_dataset(name)
        cfg = PRESETS.get(
            name.lower().replace("-synthetic", ""), ComEConfig()
        )
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
        emb = tr.embeddings()
        f1 = node_classification_f1(emb, ds.labels)
        out.update(f1)
        if ratios:
            # deepwalk/ComE-paper protocol: F1 at multiple labeled
            # fractions (evaluation/metrics.py::f1_train_ratio_sweep)
            from come_tpu.evaluation import f1_train_ratio_sweep

            out["f1_by_train_ratio"] = {
                str(r): {k: round(v, 4) for k, v in d.items()}
                for r, d in f1_train_ratio_sweep(emb, ds.labels).items()
            }
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", nargs="+",
                   default=["karate", "dblp", "wikipedia"],
                   help="dataset names, 'heavy-tail-dcsbm', or 'all'")
    p.add_argument("--fast", action="store_true")
    p.add_argument("--ratios", action="store_true",
                   help="include the F1 train-ratio sweep per dataset")
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

    names = args.datasets
    if names == ["all"]:
        from come_tpu.graphs.datasets import DATASETS

        names = sorted(DATASETS) + ["heavy-tail-dcsbm"]
    results = []
    for name in names:
        print(f"=== {name} ===", flush=True)
        res = run_one(name, args.fast, mesh_shape, ratios=args.ratios)
        print(json.dumps(res), flush=True)
        results.append(res)
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
