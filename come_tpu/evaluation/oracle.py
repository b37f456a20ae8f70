"""Numpy gradient oracle for O1/O2/O3 — the parity harness's ground truth.

BASELINE.json:5 defines acceptance as "allclose on O1/O2/O3 gradients per
iteration".  The reference's hogwild trainer applies pair updates
sequentially and racily, so its trajectory is nondeterministic (SURVEY.md §7
hard part 1); the well-defined parity target is the *expected* (race-free)
gradient of a fixed batch computed from the same initial tables.  This
module computes that in plain numpy loops — deliberately scalar, mirroring
the reference's per-pair Cython arithmetic (``utils/training_sdg_inner.pyx``
[R]) — and the jnp/Pallas paths must match it to float tolerance.

Semantic note (documented divergence, SURVEY.md §7): the hogwild kernel
applies each pair's update before scoring the next pair; synchronous
minibatch SGD scores every pair against the *initial* tables and sums
duplicate-row updates.  Both are SGD on the same objective; LR scaling is
matched per pair.  The oracle implements the synchronous semantics.
"""

from __future__ import annotations

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def sgns_batch_grads(
    emb_in: np.ndarray,
    emb_out: np.ndarray,
    centers: np.ndarray,
    contexts: np.ndarray,
    negatives: np.ndarray,
    mask: np.ndarray,
    max_exp: float | None = None,
):
    """Dense-table gradients dL/demb_in, dL/demb_out for one SGNS batch.

    Pure per-pair loops; returns full [V, d] gradient tables plus the loss.
    """
    d_in = np.zeros_like(emb_in)
    d_out = np.zeros_like(emb_out)
    loss = 0.0
    P = len(centers)
    K = negatives.shape[1]
    for p in range(P):
        if not mask[p]:
            continue
        i, j = int(centers[p]), int(contexts[p])
        phi = emb_in[i]
        # positive pair
        s = float(phi @ emb_out[j])
        if max_exp is None or abs(s) < max_exp:
            g = sigmoid(s) - 1.0  # dL/ds
            loss += -np.log(max(sigmoid(s), 1e-30))
            d_in[i] += g * emb_out[j]
            d_out[j] += g * phi
        # negatives
        for k in range(K):
            n = int(negatives[p, k])
            s = float(phi @ emb_out[n])
            if max_exp is not None and abs(s) >= max_exp:
                continue
            g = sigmoid(s)  # dL/ds for label 0
            loss += -np.log(max(1.0 - sigmoid(s), 1e-30))
            d_in[i] += g * emb_out[n]
            d_out[n] += g * phi
    return loss, d_in, d_out


def sgns_batch_grads_tied(
    emb: np.ndarray, centers, contexts, negatives, mask, max_exp=None
):
    """O2 mode: both sides in one table; gradients summed into one [V,d]."""
    loss, d_in, d_out = sgns_batch_grads(
        emb, emb, centers, contexts, negatives, mask, max_exp
    )
    return loss, d_in + d_out


def community_grads(
    node_emb: np.ndarray,
    pi: np.ndarray,
    centroid: np.ndarray,
    inv_cov: np.ndarray,
    beta: float,
):
    """O3 gradient per node: beta/K * sum_k pi_ik Sigma_k^-1 (phi_i - psi_k).

    Mirrors the reference's chunked numpy loop (SURVEY.md §3.4 hot loop #4).
    """
    N, d = node_emb.shape
    K = centroid.shape[0]
    g = np.zeros_like(node_emb)
    for i in range(N):
        acc = np.zeros(d)
        for k in range(K):
            acc += pi[i, k] * inv_cov[k] @ (node_emb[i] - centroid[k])
        g[i] = (beta / K) * acc
    return g


def gmm_log_likelihood(X, means, covs, weights):
    """Mean per-sample GMM log-likelihood (for EM quality comparison)."""
    from scipy.stats import multivariate_normal

    N, K = X.shape[0], means.shape[0]
    lp = np.zeros((N, K))
    for k in range(K):
        lp[:, k] = multivariate_normal.logpdf(X, means[k], covs[k]) + np.log(
            weights[k]
        )
    m = lp.max(axis=1)
    return float(np.mean(m + np.log(np.exp(lp - m[:, None]).sum(axis=1))))
