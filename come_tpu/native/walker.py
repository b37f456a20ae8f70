"""Python wrapper for the C++ walk feeder + a double-buffered feed loop."""

from __future__ import annotations

import ctypes
import os
import threading
from queue import Queue

import numpy as np

from come_tpu.graphs.csr import CSRGraph
from come_tpu.native.build import load_native


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def host_random_walks(
    graph: CSRGraph,
    starts: np.ndarray,
    length: int,
    seed: int = 0,
    restart_prob: float = 0.0,
    num_threads: int | None = None,
) -> np.ndarray:
    """Multithreaded host-side walks [len(starts), length] (int32)."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native walker library unavailable (g++ missing?)")
    starts = np.ascontiguousarray(starts, np.int32)
    out = np.empty((len(starts), length), np.int32)
    indptr = np.ascontiguousarray(graph.indptr, np.int32)
    indices = np.ascontiguousarray(graph.indices, np.int32)
    nt = num_threads or min(os.cpu_count() or 1, 16)
    lib.come_random_walks(
        _ptr(indptr),
        _ptr(indices),
        ctypes.c_int64(graph.num_nodes),
        _ptr(starts),
        ctypes.c_int64(len(starts)),
        ctypes.c_int32(length),
        ctypes.c_uint64(seed),
        ctypes.c_float(restart_prob),
        _ptr(out),
        ctypes.c_int32(nt),
    )
    return out


class HostWalkFeeder:
    """Double-buffered host->device walk pipeline.

    A background thread keeps up to ``prefetch`` walk batches ready while the
    device trains on the current one — the role the reference filled with a
    multiprocessing pool + walk files on disk (SURVEY.md C3), minus the disk.

    Usage:
        feeder = HostWalkFeeder(graph, batch=4096, length=80, seed=0)
        for walks in feeder:          # np.int32 [batch, length]
            train_step(jnp.asarray(walks))
        feeder.close()
    """

    def __init__(
        self,
        graph: CSRGraph,
        batch: int,
        length: int,
        seed: int = 0,
        restart_prob: float = 0.0,
        prefetch: int = 2,
        num_threads: int | None = None,
        nodes: np.ndarray | None = None,
    ):
        self.graph = graph
        self.batch = batch
        self.length = length
        self.restart_prob = restart_prob
        self.num_threads = num_threads
        # start-node pool: the full graph by default; a subset for
        # per-process feeders under a mesh (each process walks only its
        # data rows' slice of the node range — reference C3's per-worker
        # walk files)
        self._nodes = (
            np.arange(graph.num_nodes, dtype=np.int32)
            if nodes is None
            else np.asarray(nodes, np.int32)
        )
        if self._nodes.size == 0:
            # an empty pool would busy-spin the producer and block next()
            raise ValueError("HostWalkFeeder: empty start-node pool")
        self._q: Queue = Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        epoch = 0
        v = len(self._nodes)
        while not self._stop.is_set():
            perm = self._rng.permutation(self._nodes)
            for ofs in range(0, v, self.batch):
                if self._stop.is_set():
                    return
                starts = perm[ofs : ofs + self.batch]
                if len(starts) < self.batch:  # wrap the tail
                    starts = np.resize(
                        np.concatenate([starts, perm]), self.batch
                    )
                walks = host_random_walks(
                    self.graph,
                    starts,
                    self.length,
                    seed=self._seed + epoch * 1_000_003 + ofs,
                    restart_prob=self.restart_prob,
                    num_threads=self.num_threads,
                )
                self._q.put(walks)
            epoch += 1

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._stop.is_set():
            raise StopIteration
        return self._q.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
