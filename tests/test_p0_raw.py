"""p0 raw-format ingestion: the reference's encounter/vitals/split-ids
pickles through the CLI (generate_data + abnormal-vital extraction +
outcome-label joins)."""

import os
import pickle

import numpy as np
import pandas as pd
import pytest

from deep_interpolation_clustering_tpu.cli import p0
from deep_interpolation_clustering_tpu.cli.common import load_processed, config_from_args
from deep_interpolation_clustering_tpu.info import COHORTS, USE_FEATURES


@pytest.fixture
def raw_dir(tmp_path, rng):
    n = 60
    ids = [f"e{i:03d}" for i in range(n)]
    encounter = pd.DataFrame({
        "encounter_deiden_id": ids,
        "AKI_overall": rng.randint(0, 2, n),
        "mort_status_30d": rng.randint(0, 2, n),
    })
    vitals = {}
    for v in USE_FEATURES:
        rows = []
        for e in ids:
            k = rng.randint(2, 9)
            for t in sorted(rng.rand(k) * 7.5):  # includes hour 6-7 records
                rows.append((e, t, rng.rand() * 50 + 60))
        vitals[v] = pd.DataFrame(
            rows, columns=["encounter_deiden_id", "time_stamp", "measurement"]
        )
    split_ids = {
        "training": ids[:40], "validation": ids[40:50], "testing": ids[50:],
    }
    d = tmp_path / "raw"
    d.mkdir()
    encounter.to_csv(d / "encounter.csv", index=False)
    with open(d / "vitals.pickle", "wb") as f:
        pickle.dump(vitals, f)
    with open(d / "split_ids.pickle", "wb") as f:
        pickle.dump(split_ids, f)
    return str(d)


def test_p0_raw_ingestion(tmp_path, raw_dir, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p0.main(["--raw_dir", raw_dir, "--base_path", "Data"])

    class _Args:
        base_path = "Data"

    import argparse

    cfg = config_from_args(argparse.Namespace(config=None, base_path="Data"))
    splits = load_processed(cfg)
    assert set(splits) == set(COHORTS)
    tr = splits["training"]
    assert len(tr["encounter_id"]) == 40
    n, c, t = tr["feat"].shape
    assert c == len(USE_FEATURES)
    # only first-6h observations gridded
    assert tr["time_step"].max() <= 6.0
    # min-max normalized with the fixed physiological ranges: observed
    # heartRate values (raw 60-110 within range 0-300) land in [0, 1]
    hr = tr["feat"][:, 2][tr["padding_mask"][:, 2] > 0]
    assert 0.0 <= hr.min() and hr.max() <= 1.0
    # hold-out mask is a subset of the padding mask
    assert np.all(tr["drop_mask"] <= tr["padding_mask"])
    # outcome labels joined
    assert tr["AKI_overall"].shape == (40,)
    assert set(np.unique(tr["AKI_overall"])) <= {0.0, 1.0}
    # future-vital targets normalized or NaN
    fv = tr["future_vital"]
    assert fv.shape == (40, c)
    # heartRate (range 0-300 covers the raw 60-110) normalizes into [0,1]
    fv_hr = fv[:, 2][np.isfinite(fv[:, 2])]
    assert fv_hr.size and (0 <= fv_hr).all() and (fv_hr <= 1).all()
    # aux CSV written
    assert os.path.exists("Data/next_hour_abnormal_norm_val.csv")


def test_p0_cache_skip_and_invalidate(tmp_path, raw_dir, monkeypatch):
    """Second identical p0 run is a fingerprint-gated no-op (reference
    p0_data_process.py:200-204's skip-if-exists, but content-tied); any
    input change or --overwrite recomputes; a stale/absent sidecar never
    silently serves old pickles."""
    monkeypatch.chdir(tmp_path)
    p0.main(["--raw_dir", raw_dir, "--base_path", "Data"])
    pkl = "Data/model_data/split_processed/training.pickle"
    fp = "Data/model_data/split_processed/p0.fp"
    assert os.path.exists(fp)
    t0 = os.path.getmtime(pkl)

    # 1) identical inputs: skipped (pickle not rewritten)
    p0.main(["--raw_dir", raw_dir, "--base_path", "Data"])
    assert os.path.getmtime(pkl) == t0

    # 2) changed preprocessing config: recomputes
    p0.main(["--raw_dir", raw_dir, "--base_path", "Data",
             "--holdout_frac", "0.3"])
    t1 = os.path.getmtime(pkl)
    assert t1 > t0

    # 3) changed raw input bytes: recomputes
    with open(os.path.join(raw_dir, "encounter.csv"), "a") as f:
        f.write("\n")
    p0.main(["--raw_dir", raw_dir, "--base_path", "Data",
             "--holdout_frac", "0.3"])
    t2 = os.path.getmtime(pkl)
    assert t2 > t1

    # 4) --overwrite forces recompute even with a matching fingerprint
    p0.main(["--raw_dir", raw_dir, "--base_path", "Data",
             "--holdout_frac", "0.3", "--overwrite", "true"])
    assert os.path.getmtime(pkl) > t2

    # 5) missing sidecar (e.g. crash between pickle write and fp write):
    # recomputes rather than trusting existence
    os.remove(fp)
    t3 = os.path.getmtime(pkl)
    p0.main(["--raw_dir", raw_dir, "--base_path", "Data",
             "--holdout_frac", "0.3"])
    assert os.path.getmtime(pkl) > t3
    assert os.path.exists(fp)

    # 6) raw mode's aux CSV is part of the cache contract: a hit must
    # vouch for EVERY p0 output, so a deleted CSV recomputes (and the
    # recompute restores it) even though pickles + fingerprint match
    aux = "Data/next_hour_abnormal_norm_val.csv"
    assert os.path.exists(aux)
    os.remove(aux)
    p0.main(["--raw_dir", raw_dir, "--base_path", "Data",
             "--holdout_frac", "0.3"])
    assert os.path.exists(aux)


def test_p0_raw_slice_cache(tmp_path, raw_dir, monkeypatch):
    """The split_org raw-slice cache (reference p0_data_process.py:172-185):
    a re-run that changes only hold-out/normalization knobs must skip the
    gridding stage entirely, re-running the cheap tail from the cached
    slices; source/hours changes re-grid."""
    monkeypatch.chdir(tmp_path)
    p0.main(["--raw_dir", raw_dir, "--base_path", "Data"])
    org = "Data/model_data/split_org/training.pickle"
    pkl = "Data/model_data/split_processed/training.pickle"
    assert os.path.exists(org)
    t_org = os.path.getmtime(org)
    t_pkl = os.path.getmtime(pkl)

    # changed preprocessing knob: gridding SKIPPED (generate_data must not
    # run), processed pickles recomputed from the cached slices
    def boom(*a, **k):
        raise AssertionError("generate_data ran despite a valid raw cache")

    monkeypatch.setattr(p0, "generate_data", boom)
    p0.main(["--raw_dir", raw_dir, "--base_path", "Data",
             "--holdout_frac", "0.3"])
    assert os.path.getmtime(org) == t_org  # raw slices untouched
    assert os.path.getmtime(pkl) > t_pkl  # processed recomputed
    tr = load_processed(config_from_args(
        __import__("argparse").Namespace(config=None, base_path="Data")
    ))["training"]
    held = tr["padding_mask"].sum() - tr["drop_mask"].sum()
    assert held > 0  # hold-out re-applied at the new fraction
    monkeypatch.undo()

    # changed raw bytes: re-grids (raw fingerprint mismatch)
    with open(os.path.join(raw_dir, "encounter.csv"), "a") as f:
        f.write("\n")
    p0.main(["--raw_dir", raw_dir, "--base_path", "Data",
             "--holdout_frac", "0.3"])
    assert os.path.getmtime(org) > t_org

    # a deleted aux CSV invalidates the raw cache too (it is a raw-stage
    # artifact the skip would otherwise never restore)
    os.remove("Data/next_hour_abnormal_norm_val.csv")
    t_org2 = os.path.getmtime(org)
    p0.main(["--raw_dir", raw_dir, "--base_path", "Data",
             "--holdout_frac", "0.2"])
    assert os.path.exists("Data/next_hour_abnormal_norm_val.csv")
    assert os.path.getmtime(org) > t_org2


def test_p0_raw_cache_synthetic_seed(tmp_path, monkeypatch):
    """Synthetic mode: the raw cache keys on the generator params + seed —
    same seed skips generation, a changed seed regenerates."""
    monkeypatch.chdir(tmp_path)
    args = ["--synthetic", "60", "--synthetic_max_obs", "12",
            "--num_timestamps", "12", "--base_path", "Data"]
    p0.main(args)
    org = "Data/model_data/split_org/training.pickle"
    t0 = os.path.getmtime(org)

    def boom(*a, **k):
        raise AssertionError("make_synthetic_cohorts ran despite raw cache")

    monkeypatch.setattr(p0, "make_synthetic_cohorts", boom)
    p0.main(args + ["--holdout_frac", "0.3"])
    assert os.path.getmtime(org) == t0
    monkeypatch.undo()

    p0.main(args + ["--seed", "99"])
    assert os.path.getmtime(org) > t0
