"""Graph layer tests: CSR container, loaders, generators, registry."""

import numpy as np
import pytest

from come_tpu.graphs import (
    CSRGraph,
    get_dataset,
    load_adjacencylist,
    load_edgelist,
    powerlaw_graph,
    sbm_graph,
)


def test_from_arcs_symmetrize_dedup():
    g = CSRGraph.from_arcs([0, 1, 1, 2], [1, 0, 2, 2], num_nodes=3)
    # edges {0-1, 1-2}; self-loop 2-2 removed; duplicates collapsed
    assert g.num_nodes == 3
    assert g.num_edges == 2
    assert list(g.neighbors(1)) == [0, 2]
    np.testing.assert_array_equal(g.degrees, [1, 2, 1])


def test_arcs_and_edges_roundtrip():
    g = CSRGraph.from_arcs([0, 2, 3], [1, 1, 0], num_nodes=4)
    src, dst = g.edges_undirected()
    edges = set(zip(src.tolist(), dst.tolist()))
    assert edges == {(0, 1), (1, 2), (0, 3)}
    s2, d2 = g.arcs()
    assert len(s2) == 2 * len(src)


def test_subgraph_relabels():
    g = CSRGraph.from_arcs([0, 1, 2], [1, 2, 3], num_nodes=4)
    sub = g.subgraph([1, 2, 3])
    assert sub.num_nodes == 3
    assert sub.num_edges == 2  # 1-2, 2-3 -> 0-1, 1-2


def test_adjlist_loader(tmp_path):
    p = tmp_path / "g.adjlist"
    p.write_text("0 1 2\n1 0\n2 0\n3 0\n")
    g = load_adjacencylist(p)
    assert g.num_nodes == 4
    assert g.num_edges == 3
    assert g.degrees[0] == 3


def test_edgelist_loader_string_labels(tmp_path):
    p = tmp_path / "g.edges"
    p.write_text("a b\nb c\n# comment\nc a\n")
    g = load_edgelist(p)
    assert g.num_nodes == 3
    assert g.num_edges == 3
    assert list(g.node_names) == ["a", "b", "c"]


def test_karate_dataset():
    ds = get_dataset("karate")
    assert ds.graph.num_nodes == 34
    assert ds.graph.num_edges == 78
    assert ds.labels is not None and len(ds.labels) == 34
    assert ds.num_communities == 2
    # node 0 (Mr. Hi) and node 33 (Officer) are in different clubs
    assert ds.labels[0] != ds.labels[33]


def test_sbm_generator():
    g, labels = sbm_graph(200, 4, p_in=0.2, p_out=0.01, seed=1)
    assert g.num_nodes == 200
    assert len(labels) == 200
    assert set(labels.tolist()) == {0, 1, 2, 3}
    # intra-community edges should dominate
    src, dst = g.edges_undirected()
    intra = np.mean(labels[src] == labels[dst])
    assert intra > 0.7


def test_powerlaw_generator():
    g = powerlaw_graph(1000, avg_degree=10.0, seed=2)
    assert g.num_nodes == 1000
    assert g.num_edges > 1000
    degs = np.sort(g.degrees)[::-1]
    assert degs[0] > 5 * np.median(degs[degs > 0])  # skewed


def test_device_csr_pytree():
    import jax

    g = CSRGraph.from_arcs([0, 1], [1, 2], num_nodes=3).to_device()
    leaves = jax.tree_util.tree_leaves(g)
    assert len(leaves) == 4  # indptr, indices, degrees, packed ptr_deg
    assert g.num_nodes == 3


def test_synthetic_registry_entries():
    ds = get_dataset("dblp")  # smallest synthetic stand-in
    assert ds.num_communities == 5
    assert ds.graph.num_nodes == 13184


# ---- real-format fixture files (tests/fixtures; VERDICT r2 item 3) ----

FIXTURES = __import__("pathlib").Path(__file__).resolve().parent / "fixtures"


def test_matfile_fixture_loads():
    """mini.mat mirrors the BlogCatalog .mat layout (sparse `network` +
    sparse `group`) the reference's load_matfile reads [R, SURVEY.md C2]."""
    from come_tpu.graphs.loaders import load_mat_labels, load_matfile

    g = load_matfile(FIXTURES / "mini.mat")
    labels = load_mat_labels(FIXTURES / "mini.mat")
    assert g.num_nodes == 50
    assert labels.shape == (50, 3)
    assert set(np.unique(labels)) <= {0, 1}
    assert labels.sum(axis=1).min() >= 1  # every node labeled
    assert (labels.sum(axis=1) > 1).any()  # some multi-label, like real BC
    # undirected: symmetric arc counts
    src, dst = g.arcs()
    rev = set(zip(dst.tolist(), src.tolist()))
    assert all((u, v) in rev for u, v in zip(src.tolist(), dst.tolist()))


def test_fixture_formats_agree():
    """The same tiny graph in .mat / .adjlist / .edgelist formats loads to
    identical structure (real-format parsers cross-checked)."""
    from come_tpu.graphs.loaders import (
        load_adjacencylist,
        load_edgelist,
        load_ground_truth,
        load_matfile,
    )

    gm = load_matfile(FIXTURES / "mini.mat")
    ga = load_adjacencylist(FIXTURES / "mini.adjlist")
    ge = load_edgelist(FIXTURES / "mini.edgelist")
    assert gm.num_nodes == ga.num_nodes == ge.num_nodes
    np.testing.assert_array_equal(gm.degrees, ga.degrees)
    np.testing.assert_array_equal(gm.degrees, ge.degrees)
    sm, dm = gm.arcs()
    sa, da = ga.arcs()
    np.testing.assert_array_equal(sm, sa)
    np.testing.assert_array_equal(dm, da)
    labels = load_ground_truth(FIXTURES / "mini_labels.txt")
    assert labels.shape == (50,)
    assert set(np.unique(labels)) <= {0, 1, 2}


def test_fixture_trains_end_to_end():
    """PR1-shape smoke: the .mat-loaded fixture trains O1 and clusters."""
    from come_tpu.config import ComEConfig
    from come_tpu.evaluation import nmi_score
    from come_tpu.graphs.loaders import load_ground_truth, load_matfile
    from come_tpu.trainer import ComETrainer

    g = load_matfile(FIXTURES / "mini.mat")
    labels = load_ground_truth(FIXTURES / "mini_labels.txt")
    cfg = ComEConfig(
        dim=16, num_communities=3, walk_length=12, walks_per_node=6,
        window=4, negative=3, batch_walks=64, batch_pairs=512,
        outer_iters=0, pretrain_epochs=6, lr=0.05, reg_covar=1e-2,
        gmm_n_init=2,
    )
    t = ComETrainer(g, cfg)
    first = t.o1_epoch()
    for _ in range(5):
        last = t.o1_epoch()
    assert last < first
    t.fit_gmm()
    assert nmi_score(labels, t.communities()) > 0.3


def test_fetch_validator_checks_edge_counts(tmp_path):
    """fetch_data's .mat validator must reject a graph whose shape matches
    the published V/C but whose nonzero count disagrees with the published
    edge count (VERDICT r3 item 4: structure-only validation would pass a
    truncated or substituted file)."""
    import sys
    from pathlib import Path

    import scipy.io as sio
    import scipy.sparse as sp

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    from fetch_data import _validate_mat

    V, C, E = 40, 3, 30
    rng = np.random.default_rng(0)
    u = rng.integers(0, V, E)
    v = (u + 1 + rng.integers(0, V - 1, E)) % V
    net = sp.coo_matrix(
        (np.ones(2 * E), (np.r_[u, v], np.r_[v, u])), shape=(V, V)
    ).tocsc()
    net.sum_duplicates()
    nnz_edges = net.nnz // 2  # duplicates merged: actual undirected count
    grp = sp.coo_matrix(np.ones((V, C))).tocsc()
    good = tmp_path / "good.mat"
    sio.savemat(good, {"network": net, "group": grp})
    _validate_mat(good, V, C, nnz_edges)  # symmetric 2E nnz accepted
    _validate_mat(good, V, C, None)  # no published count: structural only
    with pytest.raises(AssertionError, match="nonzeros"):
        _validate_mat(good, V, C, nnz_edges + 5)
    with pytest.raises(AssertionError, match="shape"):
        _validate_mat(good, V + 1, C, nnz_edges)
