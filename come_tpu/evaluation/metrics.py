"""Evaluation metrics: community NMI and node-classification F1.

Reference parity surface (SURVEY.md C11, §3.5): NMI of argmax
responsibilities vs ground truth, and one-vs-rest logistic-regression
macro/micro-F1 on the embeddings at given train ratios (deepwalk ``scoring``
lineage).  These run on host (sklearn), exactly as the reference did — they
are off the training hot path.
"""

from __future__ import annotations

import numpy as np


def nmi_score(labels_true: np.ndarray, labels_pred: np.ndarray) -> float:
    """sklearn NMI, the reference's community-quality metric."""
    from sklearn.metrics import normalized_mutual_info_score

    return float(
        normalized_mutual_info_score(
            np.asarray(labels_true), np.asarray(labels_pred)
        )
    )


def node_classification_f1(
    embeddings: np.ndarray,
    labels: np.ndarray,
    train_ratio: float = 0.5,
    seed: int = 0,
) -> dict[str, float]:
    """One-vs-rest logistic regression macro/micro-F1.

    ``labels`` may be [V] single-label ints or [V, C] 0/1 multi-label. For
    multi-label, the deepwalk protocol is used: the classifier predicts the
    top-k labels per node where k is that node's true label count.
    """
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import f1_score
    from sklearn.multiclass import OneVsRestClassifier

    X = np.asarray(embeddings)
    y = np.asarray(labels)
    rng = np.random.default_rng(seed)
    n = X.shape[0]
    perm = rng.permutation(n)
    n_train = max(int(train_ratio * n), 1)
    tr, te = perm[:n_train], perm[n_train:]

    if y.ndim == 1:
        clf = LogisticRegression(max_iter=1000)
        clf.fit(X[tr], y[tr])
        pred = clf.predict(X[te])
        return {
            "macro_f1": float(f1_score(y[te], pred, average="macro")),
            "micro_f1": float(f1_score(y[te], pred, average="micro")),
        }

    clf = OneVsRestClassifier(LogisticRegression(max_iter=1000))
    clf.fit(X[tr], y[tr])
    probs = clf.predict_proba(X[te])
    k = y[te].sum(axis=1).astype(int)  # true label count per node
    pred = np.zeros_like(y[te])
    for i in range(len(te)):
        if k[i] > 0:
            top = np.argsort(probs[i])[-k[i] :]
            pred[i, top] = 1
    return {
        "macro_f1": float(f1_score(y[te], pred, average="macro")),
        "micro_f1": float(f1_score(y[te], pred, average="micro")),
    }


def f1_train_ratio_sweep(
    embeddings: np.ndarray,
    labels: np.ndarray,
    ratios=(0.1, 0.3, 0.5, 0.7, 0.9),
    seed: int = 0,
) -> dict[float, dict[str, float]]:
    """The deepwalk/ComE-paper protocol: F1 at multiple labeled fractions."""
    return {
        r: node_classification_f1(embeddings, labels, train_ratio=r,
                                  seed=seed)
        for r in ratios
    }
