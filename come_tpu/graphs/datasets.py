"""Dataset registry.

The reference keys everything off ``data/<Dataset>/`` files (SURVEY.md C13):
Karate (adjlist, 34 nodes), BlogCatalog / Wikipedia / Flickr (.mat), DBLP.
This registry resolves by name; .mat datasets load when their files are
present under ``data/``, and each entry has a synthetic stand-in (SBM at the
published node/community counts) so every pipeline is runnable offline.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from come_tpu.graphs.csr import CSRGraph
from come_tpu.graphs.generators import sbm_graph
from come_tpu.graphs.loaders import (
    load_adjacencylist,
    load_ground_truth,
    load_mat_labels,
    load_matfile,
)

DATA_ROOT = Path(__file__).resolve().parents[2] / "data"


@dataclasses.dataclass(frozen=True)
class Dataset:
    name: str
    graph: CSRGraph
    labels: np.ndarray | None  # [V] int single-label, or [V, C] 0/1 multi-label
    num_communities: int

    @property
    def single_labels(self) -> np.ndarray | None:
        """Single community id per node (argmax for multi-label)."""
        if self.labels is None:
            return None
        if self.labels.ndim == 2:
            return np.argmax(self.labels, axis=1).astype(np.int32)
        return self.labels


# Published sizes for the reference's datasets (SURVEY.md C13), used both for
# .mat loading (community count) and for the synthetic stand-ins.
_MAT_SPECS = {
    # p_out calibration: the SBM's cross-community rate must SHRINK with
    # V for the community signal to survive — at a fixed p_out the
    # cross-edge mass grows ~V while within mass stays ~community size.
    # Flickr at the old shared p_out=0.005 generated 91% cross edges
    # (within-edge fraction 0.093), making NMI ~0.17 a property of the
    # DATA, not the trainer; 5e-4 restores a within fraction (~0.5)
    # comparable to the smaller stand-ins (~0.35).
    "blogcatalog": dict(nodes=10312, communities=39, avg_degree=64.8,
                        p_out=0.005),
    "wikipedia": dict(nodes=4777, communities=40, avg_degree=38.7,
                      p_out=0.005),
    "flickr": dict(nodes=80513, communities=195, avg_degree=146.6,
                   p_out=0.0005),
    "dblp": dict(nodes=13184, communities=5, avg_degree=7.2,
                 p_out=0.005),
}


def _load_karate() -> Dataset:
    g = load_adjacencylist(DATA_ROOT / "Karate" / "karate.adjlist")
    labels = load_ground_truth(DATA_ROOT / "Karate" / "karate_labels.txt")
    return Dataset("karate", g, labels, num_communities=2)


def _load_mat_or_synthetic(name: str, seed: int = 0) -> Dataset:
    spec = _MAT_SPECS[name]
    for cand in (
        DATA_ROOT / name.capitalize() / f"{name}.mat",
        DATA_ROOT / name.capitalize() / f"{name.capitalize()}.mat",
        DATA_ROOT / name / f"{name}.mat",
    ):
        if cand.exists():
            g = load_matfile(cand)
            labels = load_mat_labels(cand)
            return Dataset(name, g, labels, num_communities=labels.shape[1])
    # offline stand-in at published scale
    g, labels = sbm_graph(
        spec["nodes"],
        spec["communities"],
        seed=seed,
        avg_degree=spec["avg_degree"],
        p_in=0.1,
        p_out=spec["p_out"],
    )
    return Dataset(f"{name}-synthetic", g, labels, spec["communities"])


def _load_synthetic_10m(seed: int = 0) -> Dataset:
    """BASELINE.json config 5: synthetic 10M-edge multi-host graph."""
    g, labels = sbm_graph(
        500_000, 64, seed=seed, avg_degree=40.0, p_in=0.1, p_out=0.002
    )
    return Dataset("synthetic-10m", g, labels, 64)


DATASETS = {
    "karate": _load_karate,
    "blogcatalog": lambda: _load_mat_or_synthetic("blogcatalog"),
    "wikipedia": lambda: _load_mat_or_synthetic("wikipedia"),
    "flickr": lambda: _load_mat_or_synthetic("flickr"),
    "dblp": lambda: _load_mat_or_synthetic("dblp"),
    "synthetic-10m": _load_synthetic_10m,
}


def get_dataset(name: str) -> Dataset:
    key = name.lower()
    if key not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; have {sorted(DATASETS)}")
    return DATASETS[key]()
