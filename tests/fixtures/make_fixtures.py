"""Regenerate the real-format loader fixtures (checked-in binaries).

Run from the repo root:  python tests/fixtures/make_fixtures.py

mini.mat mirrors the BlogCatalog-family layout the reference's
``load_matfile`` reads [R, SURVEY.md C2]: a sparse csc ``network``
adjacency and a sparse 0/1 ``group`` membership matrix, MATLAB v5 format
(scipy.io.savemat).  mini.adjlist / mini_labels.txt mirror the deepwalk
adjacency-list + ground-truth formats of data/Karate.
"""

from __future__ import annotations

import pathlib

import numpy as np
from scipy import sparse
from scipy.io import savemat

HERE = pathlib.Path(__file__).resolve().parent


def main() -> None:
    rng = np.random.default_rng(42)
    V, C = 50, 3
    # two dense blocks + sparse noise, symmetric, no self loops
    comm = rng.integers(0, C, V)
    prob = np.where(comm[:, None] == comm[None, :], 0.35, 0.02)
    a = rng.random((V, V)) < prob
    a = np.triu(a, 1)
    a = a | a.T
    net = sparse.csc_matrix(a.astype(np.float64))
    grp = np.zeros((V, C), np.float64)
    grp[np.arange(V), comm] = 1.0
    # some nodes are multi-label, like the real BlogCatalog groups
    extra = rng.integers(0, C, V)
    multi = rng.random(V) < 0.2
    grp[np.arange(V)[multi], extra[multi]] = 1.0
    savemat(HERE / "mini.mat", {"network": net, "group": sparse.csc_matrix(grp)})

    src, dst = np.nonzero(np.triu(a, 1))
    with open(HERE / "mini.adjlist", "w") as f:
        f.write("# tiny real-format adjacency list (deepwalk style)\n")
        for u in range(V):
            nbrs = np.nonzero(a[u])[0]
            f.write(" ".join(str(x + 1) for x in [u] + list(nbrs)) + "\n")
    with open(HERE / "mini_labels.txt", "w") as f:
        f.write("# node label\n")
        for u in range(V):
            f.write(f"{u + 1} {comm[u]}\n")
    with open(HERE / "mini.edgelist", "w") as f:
        f.write("# u v\n")
        for u, v in zip(src, dst):
            f.write(f"{u + 1} {v + 1}\n")
    print(f"wrote fixtures for V={V} C={C} E={len(src)} under {HERE}")


if __name__ == "__main__":
    main()
