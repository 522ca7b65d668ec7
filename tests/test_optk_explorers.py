"""DBSCAN / OPTICS explorers, summary writer, and interpolation-eval mode."""

import json
import os

import numpy as np
import pytest

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.cluster import DbscanExplorer, OpticsExplorer


@pytest.fixture
def blobs(rng):
    centers = rng.randn(3, 8) * 10
    labels = rng.randint(0, 3, 240)
    return (centers[labels] + rng.randn(240, 8) * 0.5).astype(np.float32)


def test_dbscan_explorer(tmp_path, blobs):
    ex = DbscanExplorer(Config(), str(tmp_path), min_samples=10)
    kd = ex.k_distance_graph(blobs, plot=False)
    assert kd["kth_distances"].shape == (240,)
    assert kd["knee_eps"] is None or kd["knee_eps"] > 0
    rows = ex.eps_sweep(blobs, eps_values=[0.5, 2.0, 5.0])
    assert len(rows) == 3
    # some eps in the sweep recovers the 3 blobs
    assert any(r["n_clusters"] == 3 for r in rows)


def test_optics_explorer(tmp_path, blobs):
    out = OpticsExplorer(Config(), str(tmp_path), min_samples=10).run(
        blobs, method="xi", plot=False
    )
    assert out["reachability"].shape == (240,)
    assert len(set(out["labels"].tolist()) - {-1}) >= 2


def test_summary_jsonl(tmp_path):
    from deep_interpolation_clustering_tpu.train import Summary

    s = Summary(str(tmp_path), use_tensorboard=False)
    s.add_summary(3, scope="valid", loss=1.5, ae_mse=0.5, lr=1e-3, ignored_key=9.9)
    s.close()
    lines = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    assert len(lines) == 1
    rec = lines[0]
    assert rec["step"] == 3 and rec["scope"] == "valid"
    assert rec["loss"] == 1.5 and rec["lr"] == 1e-3
    assert "ignored_key" not in rec  # filtered to METRICS ∪ SUMMARY_ITEMS


def test_evaluate_interpolation_mode(tmp_path):
    """--evaluate_interpolation forces denoised eval and the _interp_eval
    dump name (reference pretrain_trainer.py:255-256, :99-102)."""
    from deep_interpolation_clustering_tpu.data import (
        ArrayDataset,
        make_synthetic_cohorts,
        process_splits,
    )
    from deep_interpolation_clustering_tpu.train import Trainer

    cfg = Config(
        batch_size=16, num_timestamps=16, max_epochs=2,
        log_train_freq=1000, log_valid_freq=1000,
        evaluate_interpolation=True,
    )
    cohorts = process_splits(
        make_synthetic_cohorts(n_total=80, max_obs=16, seed=9),
        rng=np.random.RandomState(0),
    )
    ds = {c: ArrayDataset(cfg, d, c) for c, d in cohorts.items()}
    tr = Trainer(cfg, ds, str(tmp_path), use_tensorboard=False)
    tr.train()
    tr.eval("testing", generate_feat=True)
    path = tmp_path / "out_feat" / cfg.restore_metric / "testing_interp_eval.npy"
    assert path.exists()
    d = np.load(path, allow_pickle=True).item()
    assert "rec_ob" in d and "hidden" in d
