"""A/B the star layout's max_fanout stability cap on the full ComE loop.

The star tier applies a whole segment's gradients synchronously from
group-start state, and a hub's negative weight scales with its in-group
fan-out — so an UNCAPPED layout concentrates up to 127 arcs' worth of
update (positive + 127x-weighted negatives) into one synchronous write
of a single row, where the paired tier's per-epoch arc permutation
spreads those same arcs across ~2000 groups.  max_fanout=32 splits fat
segments (nearly free: pairs/slot 2f/(f+1) is 1.94 at f=32) and the row
shuffle then scatters the splits across groups.

This probe runs the FULL BlogCatalog-config loop twice (capped 32 vs
uncapped) and reports NMI / max|emb| / NaN-ness — the measured basis for
the default.

Usage: python scripts/probe_star_stability.py
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def run(max_fanout: int) -> dict:
    import come_tpu.sampling.stars as stars
    from come_tpu.config import get_config
    from come_tpu.evaluation import nmi_score
    from come_tpu.graphs import get_dataset
    from come_tpu.trainer import ComETrainer

    orig = stars.build_star_layout
    stars.build_star_layout = functools.partial(
        orig, max_fanout=max_fanout
    )
    try:
        ds = get_dataset("blogcatalog")
        cfg = get_config("blogcatalog").replace(
            num_communities=ds.num_communities
        )
        t = ComETrainer(ds.graph, cfg)
        hist = t.train(labels=ds.single_labels)
        emb = t.embeddings()
        return {
            "max_fanout": max_fanout,
            "nmi": hist[-1].get("nmi"),
            "o2_loss_last": hist[-1].get("o2_loss"),
            "emb_absmax": float(np.abs(emb).max()),
            "finite": bool(np.isfinite(emb).all()),
        }
    finally:
        stars.build_star_layout = orig


def main():
    for mf in (32, 10**9):
        print(run(mf), flush=True)


if __name__ == "__main__":
    main()
