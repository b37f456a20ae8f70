"""Persistence: word2vec-text embeddings and full training checkpoints.

Reference surface (SURVEY.md C10, §5 "Checkpoint/resume"): ``utils/
IO_utils.py::save_embedding`` writes word2vec text (`V d` header then one
`<node> <floats>` line per node) [R]; ``Model.save/load_model`` pickles the
rest.  Here the full checkpoint is a single .npz holding every ComEParams
leaf plus the step counter and RNG key — enough to resume bit-exactly — and
is written atomically (tmp + rename) so an interrupted save can't corrupt
the previous checkpoint.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from come_tpu.models import ComEParams


def save_embedding_word2vec(
    path: str | Path, embeddings: np.ndarray, node_names=None
) -> None:
    """word2vec text format: `V d` header, then `<node> <floats>` lines."""
    emb = np.asarray(embeddings)
    v, d = emb.shape
    names = (
        [str(n) for n in node_names]
        if node_names is not None
        else [str(i) for i in range(v)]
    )
    with open(path, "w") as f:
        f.write(f"{v} {d}\n")
        for name, row in zip(names, emb):
            f.write(name + " " + " ".join(f"{x:.6f}" for x in row) + "\n")


def load_embedding_word2vec(path: str | Path):
    """Returns (embeddings [V, d] f32, names list[str])."""
    with open(path) as f:
        v, d = map(int, f.readline().split())
        names, rows = [], np.empty((v, d), np.float32)
        for i in range(v):
            parts = f.readline().split()
            names.append(parts[0])
            rows[i] = np.asarray(parts[1:], np.float32)
    return rows, names


def save_checkpoint(path: str | Path, state) -> None:
    """Atomic .npz checkpoint of a TrainState (params + step + RNG)."""
    path = Path(path)
    flat = {
        "node_emb": state.params.node_emb,
        "ctx_emb": state.params.ctx_emb,
        "centroid": state.params.centroid,
        "chol_cov": state.params.chol_cov,
        "inv_cov": state.params.inv_cov,
        "pi": state.params.pi,
        "key": jax.random.key_data(state.key),
        "words_seen": state.words_seen,
    }
    flat = {k: np.asarray(v) for k, v in flat.items()}
    fd, tmp = tempfile.mkstemp(dir=path.parent or Path("."), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str | Path):
    """Returns a TrainState restored from :func:`save_checkpoint`."""
    from come_tpu.trainer import TrainState

    z = np.load(path)
    params = ComEParams(
        node_emb=jnp.asarray(z["node_emb"]),
        ctx_emb=jnp.asarray(z["ctx_emb"]),
        centroid=jnp.asarray(z["centroid"]),
        chol_cov=jnp.asarray(z["chol_cov"]),
        inv_cov=jnp.asarray(z["inv_cov"]),
        pi=jnp.asarray(z["pi"]),
    )
    key = jax.random.wrap_key_data(jnp.asarray(z["key"]))
    return TrainState(
        params=params,
        key=key,
        words_seen=jnp.asarray(z["words_seen"]),
    )
