"""Metrics meters, scalar log, and plot smoke tests."""

import json
import time

import numpy as np

from come_tpu.metrics import ScalarLog, ThroughputMeter


def test_throughput_meter():
    m = ThroughputMeter()
    with m.window(pairs=1000):
        time.sleep(0.01)
    with m.window(pairs=2000):
        time.sleep(0.01)
    assert m.total_pairs == 3000
    assert 0 < m.rate < 3000 / 0.02 * 2


def test_scalar_log_jsonl(tmp_path):
    p = tmp_path / "log.jsonl"
    log = ScalarLog(p)
    log.log(0, loss=1.5, nmi=0.2)
    log.log(1, loss=1.2, nmi=0.4)
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert lines[0]["step"] == 0 and lines[0]["loss"] == 1.5
    assert lines[1]["nmi"] == 0.4
    assert len(log.records) == 2


def test_node_space_plot(tmp_path, rng):
    from come_tpu.evaluation.plots import node_space_plot_2d

    emb = rng.normal(size=(50, 8)).astype(np.float32)
    labels = rng.integers(0, 3, 50)
    cent = rng.normal(size=(3, 8))
    cov = np.stack([np.eye(8)] * 3)
    out = tmp_path / "space.png"
    node_space_plot_2d(emb, labels, cent, cov, path=out, title="t")
    assert out.exists() and out.stat().st_size > 1000


def test_graph_plot(tmp_path):
    from come_tpu.evaluation.plots import graph_plot
    from come_tpu.graphs import get_dataset

    ds = get_dataset("karate")
    out = tmp_path / "graph.png"
    graph_plot(ds.graph, ds.labels, path=out)
    assert out.exists() and out.stat().st_size > 1000


def test_trainer_checkpoint_dir(tmp_path):
    from come_tpu.config import get_config
    from come_tpu.graphs import get_dataset
    from come_tpu.metrics import ScalarLog
    from come_tpu.trainer import ComETrainer

    ds = get_dataset("karate")
    cfg = get_config("karate").replace(outer_iters=2, pretrain_epochs=1)
    t = ComETrainer(ds.graph, cfg)
    slog = ScalarLog(tmp_path / "scalars.jsonl")
    t.train(labels=ds.labels, checkpoint_dir=tmp_path / "ckpt",
            scalar_log=slog)
    assert (tmp_path / "ckpt" / "state_iter0.npz").exists()
    assert (tmp_path / "ckpt" / "state_iter1.npz").exists()
    assert len(slog.records) == 2
