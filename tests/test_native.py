"""C++ host walk feeder tests."""

import numpy as np
import pytest

from come_tpu.graphs import get_dataset
from come_tpu.native import HostWalkFeeder, host_random_walks, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


def test_host_walks_follow_edges():
    ds = get_dataset("karate")
    starts = np.arange(34, dtype=np.int32)
    walks = host_random_walks(ds.graph, starts, 25, seed=1)
    assert walks.shape == (34, 25)
    np.testing.assert_array_equal(walks[:, 0], starts)
    adj = {v: set(ds.graph.neighbors(v).tolist()) for v in range(34)}
    for b in range(34):
        for t in range(24):
            assert walks[b, t + 1] in adj[walks[b, t]]


def test_host_walks_deterministic_by_seed():
    ds = get_dataset("karate")
    starts = np.arange(34, dtype=np.int32)
    w1 = host_random_walks(ds.graph, starts, 10, seed=7, num_threads=1)
    w2 = host_random_walks(ds.graph, starts, 10, seed=7, num_threads=4)
    np.testing.assert_array_equal(w1, w2)  # thread count must not matter
    w3 = host_random_walks(ds.graph, starts, 10, seed=8)
    assert not np.array_equal(w1, w3)


def test_host_walks_restart_and_isolated():
    from come_tpu.graphs import CSRGraph

    g = CSRGraph.from_arcs(np.arange(99), np.arange(1, 100), num_nodes=101)
    # node 100 isolated
    walks = host_random_walks(
        g, np.array([100], np.int32), 10, seed=0
    )
    assert np.all(walks == 100)
    walks = host_random_walks(
        g, np.zeros(64, np.int32), 40, seed=0, restart_prob=0.5
    )
    assert walks.max() < 40


def test_feeder_streams_batches():
    ds = get_dataset("karate")
    feeder = HostWalkFeeder(ds.graph, batch=16, length=12, seed=0)
    batches = [next(feeder) for _ in range(5)]
    feeder.close()
    for b in batches:
        assert b.shape == (16, 12)
        assert b.min() >= 0 and b.max() < 34
    # batches differ (permuted starts)
    assert any(not np.array_equal(batches[0], b) for b in batches[1:])
