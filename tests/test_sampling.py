"""Sampling layer tests: alias distribution, walks, window pairs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from come_tpu.graphs import CSRGraph, get_dataset
from come_tpu.sampling import (
    build_alias_table,
    random_walks,
    sample_alias,
    skipgram_pairs,
    subsample_keep_probs,
    unigram_weights,
)


def test_alias_matches_distribution():
    probs = np.array([0.5, 0.25, 0.125, 0.125])
    accept, alias = build_alias_table(probs)
    s = sample_alias(jnp.asarray(accept), jnp.asarray(alias),
                     jax.random.key(0), (200_000,))
    emp = np.bincount(np.asarray(s), minlength=4) / 200_000
    np.testing.assert_allclose(emp, probs, atol=0.01)


def test_unigram_weights_power():
    w = unigram_weights(np.array([16, 1]), power=0.75)
    np.testing.assert_allclose(w[0] / w[1], 16 ** 0.75, rtol=1e-6)
    assert abs(w.sum() - 1.0) < 1e-9


def test_alias_degenerate_single():
    accept, alias = build_alias_table(np.array([1.0]))
    s = sample_alias(jnp.asarray(accept), jnp.asarray(alias),
                     jax.random.key(1), (100,))
    assert np.all(np.asarray(s) == 0)


def test_walks_follow_edges():
    ds = get_dataset("karate")
    csr = ds.graph.to_device()
    starts = jnp.arange(34, dtype=jnp.int32)
    walks = np.asarray(random_walks(csr, starts, 20, jax.random.key(0)))
    assert walks.shape == (34, 20)
    np.testing.assert_array_equal(walks[:, 0], np.arange(34))
    # every consecutive pair must be a real edge
    adj = {v: set(ds.graph.neighbors(v).tolist()) for v in range(34)}
    for b in range(34):
        for t in range(19):
            assert walks[b, t + 1] in adj[walks[b, t]], (b, t)


def test_walks_isolated_node_stays():
    g = CSRGraph.from_arcs([0], [1], num_nodes=3)  # node 2 isolated
    csr = g.to_device()
    walks = np.asarray(
        random_walks(csr, jnp.array([2], jnp.int32), 10, jax.random.key(0))
    )
    assert np.all(walks == 2)


def test_walks_restart():
    g = CSRGraph.from_arcs(np.arange(99), np.arange(1, 100), num_nodes=100)  # path
    csr = g.to_device()
    walks = np.asarray(
        random_walks(csr, jnp.zeros(64, jnp.int32), 40, jax.random.key(0),
                     restart_prob=0.5)
    )
    # with restarts a path walk can't drift far from origin
    assert walks.max() < 40
    assert (walks == 0).mean() > 0.2


def test_skipgram_pairs_shapes_and_validity():
    walks = jnp.arange(12, dtype=jnp.int32).reshape(2, 6)
    c, ctx, mask = skipgram_pairs(walks, window=3, key=jax.random.key(0))
    assert c.shape == ctx.shape == mask.shape == (2, 6, 6)
    c, ctx, mask = np.asarray(c), np.asarray(ctx), np.asarray(mask)
    # masked-in pairs point at true walk neighbors within the window
    offsets = np.array([-3, -2, -1, 1, 2, 3])
    for b in range(2):
        for t in range(6):
            for oi, o in enumerate(offsets):
                if mask[b, t, oi]:
                    assert c[b, t, oi] == walks[b, t]
                    assert ctx[b, t, oi] == walks[b, t + o]
                if not (0 <= t + o < 6):
                    assert not mask[b, t, oi]


def test_reduced_window_marginals():
    # offset distance 1 must be trained ~always-eligible more than distance W
    walks = jnp.zeros((512, 16), jnp.int32)
    _, _, mask = skipgram_pairs(walks, window=4, key=jax.random.key(2))
    m = np.asarray(mask)[:, 8, :]  # interior position, no range effects
    offsets = np.array([-4, -3, -2, -1, 1, 2, 3, 4])
    rates = m.mean(0)
    # P(|o| <= W - b), b~U{0..W-1} = (W - |o| + 1)/W
    for oi, o in enumerate(offsets):
        expect = (4 - abs(o) + 1) / 4
        expect = min(expect, 1.0)
        assert abs(rates[oi] - expect) < 0.08, (o, rates[oi], expect)


def test_subsample_keep_probs():
    p = subsample_keep_probs(np.array([1000, 10, 0]), sample=1e-2)
    assert p[2] == 1.0
    assert p[1] == 1.0  # rare node kept
    assert p[0] < 1.0  # frequent node downsampled
    p0 = subsample_keep_probs(np.array([5, 5]), sample=0.0)
    np.testing.assert_array_equal(p0, [1.0, 1.0])


def test_pairs_jit_and_walk_jit_compose():
    ds = get_dataset("karate")
    csr = ds.graph.to_device()

    @jax.jit
    def pipeline(key):
        k1, k2 = jax.random.split(key)
        walks = random_walks(csr, jnp.arange(34, dtype=jnp.int32), 10, k1)
        return skipgram_pairs(walks, 5, k2)

    c, ctx, mask = pipeline(jax.random.key(0))
    assert c.shape == (34, 10, 10)
    assert bool(mask.any())
