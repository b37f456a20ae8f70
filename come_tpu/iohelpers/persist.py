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


def save_checkpoint(path: str | Path, state, host_key=None) -> None:
    """Atomic .npz checkpoint of a TrainState (params + step + RNG).

    ``host_key``: the trainer's HOST-side RNG (walk/edge permutation
    draws).  Without it a resumed run re-seeds the permutation stream and
    diverges from the uninterrupted trajectory — pass it for bit-exact
    resume (the trainer's own save/load methods do).

    Single-host form: gathers every leaf to host memory.  Multi-host runs
    (non-fully-addressable arrays) must use :func:`save_checkpoint_sharded`
    — ``np.asarray`` on a non-addressable array raises.
    """
    flat = {k: np.asarray(v) for k, v in _state_leaves(state).items()}
    if host_key is not None:
        flat["host_key"] = np.asarray(jax.random.key_data(host_key))
    _atomic_savez(Path(path), flat)


def load_host_key(path: str | Path, process_index: int | None = None):
    """Restore the trainer host RNG saved alongside a checkpoint, or None
    for checkpoints written before it existed.  ``process_index`` selects
    a :func:`save_checkpoint_sharded` per-process file."""
    p = Path(path) if process_index is None else _proc_path(
        path, process_index
    )
    z = np.load(p)
    if "host_key" not in z.files:
        return None
    return jax.random.wrap_key_data(jnp.asarray(z["host_key"]))


def _state_leaves(state) -> dict:
    return {
        "node_emb": state.params.node_emb,
        "ctx_emb": state.params.ctx_emb,
        "centroid": state.params.centroid,
        "chol_cov": state.params.chol_cov,
        "inv_cov": state.params.inv_cov,
        "pi": state.params.pi,
        "key": jax.random.key_data(state.key),
        "words_seen": state.words_seen,
    }


def _atomic_savez(path: Path, payload: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=path.parent or Path("."), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _proc_path(path: str | Path, process_index: int) -> Path:
    path = Path(path)
    return path.with_name(f"{path.name}.proc{process_index}.npz")


def _row_start(idx) -> int:
    """Row offset of a shard index; 0 for scalars / replicated shards
    (whose index is () or all-slice(None))."""
    if not idx or idx[0].start is None:
        return 0
    return int(idx[0].start)


def save_checkpoint_sharded(
    path: str | Path, state, host_key=None, meta: dict | None = None
) -> None:
    """Multi-host-safe checkpoint: each process writes ONE npz holding only
    its ADDRESSABLE shards (no host gather of non-addressable arrays — the
    failure mode of :func:`save_checkpoint` on a multi-host mesh,
    VERDICT r2 missing #3).

    Row-sharded leaves are stored one block per owning row-offset
    (``<name>@<row_start>``, deduped across data-axis replicas); replicated
    leaves are stored whole in every process's file (they're small).
    Restore (:func:`load_checkpoint_sharded`) rebuilds global arrays via
    ``jax.make_array_from_callback``, which asks each process only for the
    shards it owns — the same ones it saved, so no cross-process IO.

    ``meta``: int-valued topology metadata (mesh shape, real node count)
    stored as ``_meta.<key>`` entries — what the ELASTIC restore path
    (:func:`load_checkpoint_global` + the trainer's reshard-on-restore)
    needs to rebuild the logical state under a different topology
    (VERDICT r3 item 7).

    Files are ``<path>.proc<i>.npz``, written atomically.  Replaces the
    reference's per-iteration ``Model.save`` pickle (SURVEY.md C10) for
    sharded runs.
    """
    payload: dict = {"_process_count": np.int64(jax.process_count())}
    for k, v in (meta or {}).items():
        payload[f"_meta.{k}"] = np.int64(v)
    if host_key is not None:
        payload["host_key"] = np.asarray(jax.random.key_data(host_key))
    for name, x in _state_leaves(state).items():
        if not isinstance(x, jax.Array) or x.is_fully_addressable:
            arr = np.asarray(x)
            payload[name] = arr
            payload[f"{name}.shape"] = np.asarray(arr.shape, np.int64)
            continue
        payload[f"{name}.shape"] = np.asarray(x.shape, np.int64)
        seen = set()
        for s in x.addressable_shards:
            start = _row_start(s.index)
            if start in seen:  # data-axis replica of the same block
                continue
            seen.add(start)
            payload[f"{name}@{start}"] = np.asarray(s.data)
    _atomic_savez(_proc_path(path, jax.process_index()), payload)


def load_checkpoint_sharded(path: str | Path, layout):
    """Restore a :func:`save_checkpoint_sharded` checkpoint onto ``layout``
    (a parallel.MeshLayout): every process reads only its own file and
    contributes its addressable shards via ``make_array_from_callback``.

    The mesh/process topology must match the one that saved (asserted via
    the stored process count).
    """
    from jax.sharding import NamedSharding

    from come_tpu.trainer import TrainState

    z = np.load(_proc_path(path, jax.process_index()))
    saved_procs = int(z["_process_count"])
    if saved_procs != jax.process_count():
        raise ValueError(
            f"checkpoint saved with {saved_procs} processes, "
            f"running with {jax.process_count()} — use the trainer's "
            f"elastic restore (load_checkpoint resharding via "
            f"load_checkpoint_global)"
        )
    saved_mesh = (
        int(z["_meta.data"]) if "_meta.data" in z.files else None,
        int(z["_meta.model"]) if "_meta.model" in z.files else None,
    )
    if saved_mesh[1] is not None and (
        saved_mesh != (layout.data_size, layout.model_size)
    ):
        # same process count but a different mesh shape would previously
        # restore SILENTLY WRONG rows (the a2a interleave depends on the
        # model-axis size) — refuse and point at the elastic path
        raise ValueError(
            f"checkpoint saved on a {saved_mesh} mesh, restoring onto "
            f"({layout.data_size}, {layout.model_size}) — use the "
            f"trainer's elastic restore"
        )
    specs = layout.params_specs()

    def restore(name, spec):
        shape = tuple(int(v) for v in z[f"{name}.shape"])
        sharding = NamedSharding(layout.mesh, spec)
        if name in z.files:  # replicated / fully-addressable leaf
            arr = z[name]
            return jax.make_array_from_callback(
                shape, sharding, lambda idx: arr[idx]
            )

        def cb(idx):
            return z[f"{name}@{_row_start(idx)}"]

        return jax.make_array_from_callback(shape, sharding, cb)

    from come_tpu.models import ComEParams
    from jax.sharding import PartitionSpec as P

    params = ComEParams(
        node_emb=restore("node_emb", specs.node_emb),
        ctx_emb=restore("ctx_emb", specs.ctx_emb),
        centroid=restore("centroid", specs.centroid),
        chol_cov=restore("chol_cov", specs.chol_cov),
        inv_cov=restore("inv_cov", specs.inv_cov),
        pi=restore("pi", specs.pi),
    )
    key = jax.random.wrap_key_data(
        jnp.asarray(restore("key", P()))
    )
    return TrainState(
        params=params,
        key=key,
        words_seen=restore("words_seen", P()),
    )


def load_checkpoint_meta(path: str | Path, process_index: int = 0) -> dict:
    """Topology metadata of a sharded checkpoint: the ``_meta.*`` ints plus
    ``process_count``.  Empty dict for pre-metadata checkpoints.

    ``process_index``: which per-process file to read — every file carries
    the same metadata; multi-process callers MUST read their OWN file
    (reading a peer's races that peer's still-in-flight save)."""
    p = _proc_path(path, process_index)
    if not p.exists():
        return {}
    z = np.load(p)
    meta = {}
    for k in z.files:
        if k.startswith("_meta."):
            meta[k[len("_meta."):]] = int(z[k])
    if "_process_count" in z.files:
        meta["process_count"] = int(z["_process_count"])
    return meta


def load_checkpoint_global(path: str | Path):
    """Merge ALL per-process shard files of a sharded checkpoint into
    host-global numpy arrays — the first half of the ELASTIC restore path
    (VERDICT r3 item 7: topology may change between save and restore).

    Requires every ``<path>.proc<i>.npz`` to be visible on this host (a
    shared filesystem, or files copied together).  Row-sharded leaves are
    reassembled from their ``<name>@<row_start>`` blocks with full-coverage
    verification; replicated leaves are taken from any file.

    Returns ``(leaves, meta)``: ``leaves`` maps each state leaf name to a
    global np.ndarray, ``meta`` is :func:`load_checkpoint_meta`'s dict.
    """
    path = Path(path)
    files = sorted(
        path.parent.glob(path.name + ".proc*.npz"),
        key=lambda p: int(p.name.rsplit(".proc", 1)[1][:-4]),
    )
    if not files:
        raise FileNotFoundError(f"no {path.name}.proc*.npz files")
    saved_procs = int(np.load(files[0])["_process_count"])
    if len(files) != saved_procs:
        raise ValueError(
            f"checkpoint saved by {saved_procs} processes but only "
            f"{len(files)} .proc files present — elastic restore needs "
            f"all of them on one filesystem"
        )
    leaves: dict = {}
    shapes: dict = {}
    blocks: dict = {}
    meta = load_checkpoint_meta(path)
    for f in files:
        z = np.load(f)
        for k in z.files:
            if k.startswith("_meta.") or k in ("_process_count", "host_key"):
                continue
            if k.endswith(".shape"):
                shapes[k[: -len(".shape")]] = tuple(int(v) for v in z[k])
            elif "@" in k:
                name, start = k.rsplit("@", 1)
                blocks.setdefault(name, {})[int(start)] = z[k]
            else:
                leaves[k] = z[k]
    for name, bl in blocks.items():
        shape = shapes[name]
        first = next(iter(bl.values()))
        if 0 in bl and tuple(bl[0].shape) == tuple(shape):
            # replicated leaf saved as one whole block (scalars / RNG key
            # on a multi-process mesh are global but not fully addressable)
            leaves[name] = bl[0]
            continue
        out = np.zeros(shape, first.dtype)
        covered = 0
        for start, b in bl.items():
            out[start : start + b.shape[0]] = b
            covered += b.shape[0]
        if covered != shape[0]:
            raise ValueError(
                f"{name}: merged blocks cover {covered} of {shape[0]} rows"
            )
        leaves[name] = out
    return leaves, meta


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
