"""Visualization: 2-D embedding scatter with GMM ellipses, graph plots.

Reference surface: ``utils/plot_utils.py::node_space_plot_2D / graph_plot``
[R, SURVEY.md C11] — matplotlib PNGs colored by community, with the fitted
GMM drawn as covariance ellipses.  High-d embeddings are projected by PCA
(the reference used t-SNE for figures; PCA keeps ellipses meaningful and is
deterministic — pass ``method='tsne'`` for the reference look).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _project_2d(emb: np.ndarray, method: str = "pca", seed: int = 0):
    if emb.shape[1] == 2:
        return emb, np.eye(emb.shape[1])[:, :2]
    if method == "tsne":
        from sklearn.manifold import TSNE

        return (
            TSNE(2, random_state=seed, init="pca").fit_transform(emb),
            None,
        )
    emb0 = emb - emb.mean(0)
    _, _, vt = np.linalg.svd(emb0, full_matrices=False)
    basis = vt[:2].T
    return emb0 @ basis, basis


def node_space_plot_2d(
    embeddings: np.ndarray,
    labels: np.ndarray | None = None,
    centroids: np.ndarray | None = None,
    covariances: np.ndarray | None = None,
    path: str | Path | None = None,
    method: str = "pca",
    title: str = "",
):
    """Scatter the embedding space; optionally draw GMM component ellipses.

    Returns the matplotlib Figure (also saved to ``path`` when given).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Ellipse

    emb = np.asarray(embeddings)
    xy, basis = _project_2d(emb, method)
    fig, ax = plt.subplots(figsize=(7, 6))
    c = np.asarray(labels) if labels is not None else None
    sc = ax.scatter(xy[:, 0], xy[:, 1], c=c, cmap="tab20", s=18, alpha=0.85)
    if labels is not None:
        fig.colorbar(sc, ax=ax, shrink=0.8)

    if centroids is not None and basis is not None:
        mu2 = (np.asarray(centroids) - emb.mean(0)) @ basis
        ax.scatter(mu2[:, 0], mu2[:, 1], marker="x", c="k", s=80)
        if covariances is not None:
            for k in range(len(mu2)):
                cov2 = basis.T @ np.asarray(covariances)[k] @ basis
                vals, vecs = np.linalg.eigh(cov2)
                ang = np.degrees(np.arctan2(vecs[1, 1], vecs[0, 1]))
                for nsig in (1.0, 2.0):
                    ax.add_patch(
                        Ellipse(
                            mu2[k],
                            2 * nsig * np.sqrt(max(vals[1], 0)),
                            2 * nsig * np.sqrt(max(vals[0], 0)),
                            angle=ang,
                            fill=False,
                            edgecolor="k",
                            alpha=0.4,
                        )
                    )
    ax.set_title(title)
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def graph_plot(
    graph,
    labels: np.ndarray | None = None,
    path: str | Path | None = None,
    seed: int = 0,
    title: str = "",
):
    """Spring-layout graph drawing colored by community (networkx)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import networkx as nx

    g = nx.Graph()
    src, dst = graph.edges_undirected()
    g.add_nodes_from(range(graph.num_nodes))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    pos = nx.spring_layout(g, seed=seed)
    fig, ax = plt.subplots(figsize=(7, 6))
    nx.draw_networkx(
        g,
        pos,
        ax=ax,
        node_color=labels if labels is not None else "C0",
        cmap="tab20",
        node_size=60,
        with_labels=False,
        edge_color="#bbbbbb",
        width=0.5,
    )
    ax.set_title(title)
    ax.axis("off")
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig
