"""Self-enforcing acceptance checks on REAL BlogCatalog (VERDICT r3 item 4).

These tests skip cleanly until ``data/BlogCatalog/blogcatalog.mat`` exists
(zero-egress build hosts); the first host that runs
``python scripts/fetch_data.py --only blogcatalog`` turns them on with no
manual steps.  They are the pytest form of the acceptance bar
(BASELINE.json:2/5): published-stats validation, the gradient gate on the
real graph, and a short-budget quality check.  The full paper-band run
stays ``scripts/parity_blogcatalog.py``.
"""

from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
MAT = REPO / "data" / "BlogCatalog" / "blogcatalog.mat"

pytestmark = pytest.mark.skipif(
    not MAT.exists(),
    reason="real BlogCatalog .mat not fetched (zero-egress host) — run "
    "scripts/fetch_data.py --only blogcatalog",
)


def _dataset():
    from come_tpu.graphs import get_dataset

    ds = get_dataset("blogcatalog")
    assert not ds.name.endswith("-synthetic"), ds.name
    return ds


def test_real_blogcatalog_published_stats():
    """The loaded graph must match the PUBLISHED BlogCatalog statistics
    exactly (V=10312, E=333983, C=39) — a truncated or substituted file
    fails here even if it parses."""
    ds = _dataset()
    assert ds.graph.num_nodes == 10312
    assert ds.graph.num_edges == 333983
    assert ds.num_communities == 39
    assert ds.labels is not None and ds.labels.shape == (10312, 39)


def test_real_blogcatalog_gradient_gate():
    """The numpy-oracle gradient gate on the REAL graph (the allclose bar
    of BASELINE.json:5, same harness the synthetic suite runs)."""
    from come_tpu.evaluation.parity import check_gradient_parity

    ds = _dataset()
    rep = check_gradient_parity(
        ds.graph, dim=32, pairs=512, num_communities=ds.num_communities
    )
    assert rep.passed, str(rep)


def test_real_blogcatalog_short_budget_quality():
    """A deliberately short training budget must already clear easy floors
    (far below the paper band, far above random): micro-F1 at the
    deepwalk 50% protocol > 0.15 and NMI > 0.03.  Catches silent
    quality regressions the moment real data lands; the paper-band bar
    itself is scripts/parity_blogcatalog.py."""
    from come_tpu.config import get_config
    from come_tpu.evaluation import nmi_score, node_classification_f1
    from come_tpu.trainer import ComETrainer

    ds = _dataset()
    cfg = get_config("blogcatalog").replace(
        num_communities=ds.num_communities,
        walks_per_node=2,
        walk_length=40,
        pretrain_epochs=1,
        outer_iters=2,
        gmm_n_init=1,
        gmm_max_iter=30,
    )
    t = ComETrainer(ds.graph, cfg)
    t.train()
    f1 = node_classification_f1(t.embeddings(), ds.labels)
    assert f1["micro_f1"] > 0.15, f1
    nmi = nmi_score(ds.single_labels, t.communities())
    assert nmi > 0.03, nmi
