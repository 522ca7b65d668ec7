"""Fused (lax.scan) epochs must be bit-identical to per-batch stepping."""

import numpy as np
import pytest

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.data import (
    ArrayDataset,
    make_synthetic_cohorts,
    process_splits,
)
from deep_interpolation_clustering_tpu.train import Trainer


def _setup(tmp_path, fused, name):
    cfg = Config(
        batch_size=16, num_timestamps=16, max_epochs=2,
        log_train_freq=1000, log_valid_freq=1000,
        fused_epoch=fused,
    )
    raw = make_synthetic_cohorts(n_total=120, max_obs=16, seed=3)
    cohorts = process_splits(raw, rng=np.random.RandomState(0))
    ds = {c: ArrayDataset(cfg, d, c) for c, d in cohorts.items()}
    tr = Trainer(cfg, ds, str(tmp_path / name), use_tensorboard=False)
    return tr, ds


@pytest.mark.slow
def test_fused_epoch_matches_stepped(tmp_path):
    tr_f, ds_f = _setup(tmp_path, True, "fused")
    tr_s, ds_s = _setup(tmp_path, False, "stepped")

    m_f = tr_f.train_one_epoch(ds_f["training"], denoise=False)
    m_s = tr_s.train_one_epoch(ds_s["training"], denoise=False)
    assert set(m_f) == set(m_s)
    for k in m_f:
        np.testing.assert_allclose(m_f[k], m_s[k], rtol=1e-6, err_msg=k)

    v_f, d_f = tr_f.eval_one_epoch("valid", ds_f["validation"], denoise=False)
    v_s, d_s = tr_s.eval_one_epoch("valid", ds_s["validation"], denoise=False)
    for k in v_f:
        np.testing.assert_allclose(v_f[k], v_s[k], rtol=1e-6, err_msg=k)
    hid_f = np.concatenate(d_f["hidden"])
    hid_s = np.concatenate(d_s["hidden"])
    np.testing.assert_allclose(hid_f, hid_s, rtol=1e-6, atol=1e-7)
    # ragged-tail cohort (84 train rows, batch 16) covered above; dumps align
    np.testing.assert_array_equal(
        np.concatenate(d_f["__index__"]), np.concatenate(d_s["__index__"])
    )
