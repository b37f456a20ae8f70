"""Synthetic graph generators with ground-truth communities.

The reference ships fixed datasets (Karate/BlogCatalog/Wikipedia/DBLP/Flickr,
SURVEY.md C13); this environment has no network access, so scale testing and
the BASELINE.json config-5 "synthetic 10M-edge graph" use these generators.
Both return (CSRGraph, labels) so NMI evaluation works end to end.
"""

from __future__ import annotations

import numpy as np

from come_tpu.graphs.csr import CSRGraph


def sbm_graph(
    num_nodes: int,
    num_communities: int,
    p_in: float = 0.1,
    p_out: float = 0.005,
    seed: int = 0,
    avg_degree: float | None = None,
) -> tuple[CSRGraph, np.ndarray]:
    """Stochastic block model with equal-size blocks.

    If ``avg_degree`` is given, p_in/p_out are rescaled to hit it (keeping
    their ratio) — handy for generating large sparse graphs without O(V^2)
    memory: edges are sampled per-pair-of-blocks with binomial counts.
    """
    rng = np.random.default_rng(seed)
    labels = np.arange(num_nodes, dtype=np.int32) % num_communities
    rng.shuffle(labels)
    sizes = np.bincount(labels, minlength=num_communities)

    if avg_degree is not None:
        n_in = float(np.sum(sizes * (sizes - 1) / 2))
        n_out = num_nodes * (num_nodes - 1) / 2 - n_in
        exp_edges = p_in * n_in + p_out * n_out
        scale = (avg_degree * num_nodes / 2) / max(exp_edges, 1.0)
        p_in = min(p_in * scale, 1.0)
        p_out = min(p_out * scale, 1.0)

    members = [np.where(labels == k)[0] for k in range(num_communities)]
    src_all, dst_all = [], []
    for a in range(num_communities):
        for b in range(a, num_communities):
            na, nb = len(members[a]), len(members[b])
            if a == b:
                n_pairs = na * (na - 1) // 2
                p = p_in
            else:
                n_pairs = na * nb
                p = p_out
            if n_pairs == 0 or p <= 0:
                continue
            m = rng.binomial(n_pairs, p)
            if m == 0:
                continue
            # sample pair indices without materializing all pairs
            pick = rng.choice(n_pairs, size=min(m, n_pairs), replace=False)
            if a == b:
                # map linear index -> (i, j) strictly-upper-triangular
                i = (na - 2 - np.floor(
                    np.sqrt(-8 * pick + 4 * na * (na - 1) - 7) / 2 - 0.5
                )).astype(np.int64)
                j = (pick + i + 1 - na * (na - 1) // 2
                     + (na - i) * ((na - i) - 1) // 2).astype(np.int64)
                src_all.append(members[a][i])
                dst_all.append(members[a][j])
            else:
                src_all.append(members[a][pick // nb])
                dst_all.append(members[b][pick % nb])

    src = np.concatenate(src_all) if src_all else np.array([], np.int64)
    dst = np.concatenate(dst_all) if dst_all else np.array([], np.int64)
    g = CSRGraph.from_arcs(src, dst, num_nodes=num_nodes, symmetrize=True)
    return g, labels


def dc_sbm_graph(
    num_nodes: int,
    num_communities: int,
    avg_degree: float = 20.0,
    exponent: float = 2.5,
    assortativity: float = 20.0,
    seed: int = 0,
) -> tuple[CSRGraph, np.ndarray]:
    """Degree-corrected SBM: community structure + power-law degrees.

    The plain SBM's degrees are binomial (near-uniform); the reference's
    real datasets (BlogCatalog/Flickr, SURVEY.md C13) are heavy-tailed,
    which is exactly what stresses negative-sampling skew, scatter-add
    contention, and the a2a bucket-capacity envelopes.  Chung-Lu within the
    block structure: node i gets weight w_i ~ rank^{-1/(exponent-1)}
    (ranks shuffled within each block), and the expected edge count between
    blocks a,b is proportional to W_a·W_b, boosted by ``assortativity``
    when a == b.  Endpoints are drawn ∝ w within their block, so hub nodes
    emerge with degrees orders of magnitude above the mean.

    Returns (graph, labels) like ``sbm_graph`` so NMI evaluation works.
    """
    rng = np.random.default_rng(seed)
    labels = np.arange(num_nodes, dtype=np.int32) % num_communities
    rng.shuffle(labels)
    members = [np.where(labels == k)[0] for k in range(num_communities)]

    # per-node Chung-Lu weights: power-law ranks shuffled within block
    w = np.empty(num_nodes, np.float64)
    for mem in members:
        ranks = rng.permutation(len(mem)) + 1.0
        w[mem] = ranks ** (-1.0 / (exponent - 1.0))
    wsum = np.array([w[mem].sum() for mem in members])

    # expected edges between block pairs; assortativity boosts diagonal
    mix = np.outer(wsum, wsum)
    mix[np.diag_indices_from(mix)] *= assortativity
    target_edges = avg_degree * num_nodes / 2
    mix *= target_edges / np.triu(mix).sum()

    src_all, dst_all = [], []
    for a in range(num_communities):
        pa = w[members[a]] / w[members[a]].sum()
        for b in range(a, num_communities):
            m = rng.poisson(mix[a, b])
            if m == 0:
                continue
            pb = w[members[b]] / w[members[b]].sum()
            src_all.append(rng.choice(members[a], size=m, p=pa))
            dst_all.append(rng.choice(members[b], size=m, p=pb))
    src = np.concatenate(src_all) if src_all else np.array([], np.int64)
    dst = np.concatenate(dst_all) if dst_all else np.array([], np.int64)
    # low-weight nodes can end up isolated at small sizes; attach each to a
    # random same-community peer so every node is walkable (real datasets
    # have no degree-0 nodes)
    ns = src != dst  # self-loops are dropped by from_arcs — don't count
    touched = np.zeros(num_nodes, bool)
    touched[src[ns]] = True
    touched[dst[ns]] = True
    lone = np.where(~touched)[0]
    if len(lone):
        def mate(i):
            peers = members[labels[i]][members[labels[i]] != i]
            if len(peers) == 0:  # singleton community: any other node
                return (i + 1) % num_nodes
            return rng.choice(peers)

        mates = np.array([mate(i) for i in lone])
        src = np.concatenate([src, lone])
        dst = np.concatenate([dst, mates])
    g = CSRGraph.from_arcs(src, dst, num_nodes=num_nodes, symmetrize=True)
    return g, labels


def powerlaw_graph(
    num_nodes: int,
    avg_degree: float = 20.0,
    exponent: float = 2.5,
    seed: int = 0,
) -> CSRGraph:
    """Chung-Lu style power-law graph (degree-weighted random pairing).

    Used for throughput benchmarks: power-law degree skew is what stresses
    the scatter-add path (SURVEY.md §7 hard part 2).
    """
    rng = np.random.default_rng(seed)
    # target weights w_i ~ i^{-1/(exponent-1)}
    ranks = np.arange(1, num_nodes + 1, dtype=np.float64)
    w = ranks ** (-1.0 / (exponent - 1.0))
    w *= (avg_degree * num_nodes / 2) / w.sum()
    prob = w / w.sum()
    num_edges = int(avg_degree * num_nodes / 2)
    src = rng.choice(num_nodes, size=num_edges, p=prob)
    dst = rng.choice(num_nodes, size=num_edges, p=prob)
    keep = src != dst
    return CSRGraph.from_arcs(src[keep], dst[keep], num_nodes=num_nodes)
