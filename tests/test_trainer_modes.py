"""Trainer behaviors not covered elsewhere: plateau/warmup LR through real
epochs, exact optimizer-state restore, and denoise training."""

import numpy as np
import pytest

import jax

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.data import (
    ArrayDataset,
    make_synthetic_cohorts,
    process_splits,
)
from deep_interpolation_clustering_tpu.train import Trainer
from deep_interpolation_clustering_tpu.train.optim import get_learning_rate


def _mk(tmp_path, name, **cfg_kw):
    cfg_kw.setdefault("max_epochs", 4)
    cfg = Config(
        batch_size=16, num_timestamps=16,
        log_train_freq=1000, log_valid_freq=1000, **cfg_kw,
    )
    cohorts = process_splits(
        make_synthetic_cohorts(n_total=80, max_obs=16, seed=21),
        rng=np.random.RandomState(0),
    )
    ds = {c: ArrayDataset(cfg, d, c) for c, d in cohorts.items()}
    return Trainer(cfg, ds, str(tmp_path / name), use_tensorboard=False), ds


def test_warmup_schedule_through_trainer(tmp_path):
    tr, ds = _mk(
        tmp_path, "warmup", lr_decay_mode="warmup",
        warmup_multiplier=8, warmup_epochs=10, init_lr=1e-3,
    )
    tr.train()
    # after 3 completed epochs the LR ramped: 1e-3 * (1 + 7*3/10)
    assert abs(tr.lr_schedule.lr - 1e-3 * (1 + 7 * 3 / 10)) < 1e-9
    assert abs(get_learning_rate(tr.opt_state) - tr.lr_schedule.lr) < 1e-9


def test_plateau_schedule_through_trainer(tmp_path):
    tr, ds = _mk(
        tmp_path, "plateau", lr_decay_mode="plateau",
        lr_decay_step_or_patience=0, lr_decay_rate=0.5, init_lr=1e-3,
    )
    tr.train()
    # patience 0: any non-improving epoch halves the LR; at minimum the
    # schedule ran and stayed clamped above min_lr
    assert tr.lr_schedule.lr <= 1e-3
    assert tr.lr_schedule.lr >= tr.cfg.min_lr


@pytest.mark.slow
def test_denoise_training(tmp_path):
    tr, ds = _mk(tmp_path, "denoise", denoise=True)
    m = tr.train_one_epoch(ds["training"], denoise=True)
    assert np.isfinite(m["loss"])


@pytest.mark.slow
def test_optimizer_state_restore_exact(tmp_path):
    """Resume must continue bit-where-it-left: restored params AND optimizer
    moments equal the checkpointed ones."""
    tr, ds = _mk(tmp_path, "resume")
    tr.train()
    best = tr.flag_dict.best_epoch["ae_mse"]

    tr2, _ = _mk(tmp_path, "resume")  # same exp dir
    tr2.load_weight("ae_mse")
    assert tr2.epoch == best
    # compare optimizer moment leaves exactly
    a = jax.device_get(jax.tree_util.tree_leaves(tr2.opt_state))
    # re-load the raw checkpoint to compare against
    import os
    from deep_interpolation_clustering_tpu.train import checkpoint as ckpt

    path = os.path.join(str(tmp_path / "resume"), "weight", "ae_mse", ckpt.CKPT_NAME)
    _, _, _, opt_state, _ = ckpt.load_checkpoint(path, opt_state_template=tr2.opt_state)
    b = jax.device_get(jax.tree_util.tree_leaves(opt_state))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_prng_impl_rbg(tmp_path):
    """`Config.prng_impl="rbg"` trains (finite losses) and is reproducible
    within one backend: two trainers with the same seed walk identical
    trajectories. (Cross-backend/sharding determinism is explicitly NOT in
    rbg's contract — see the config.py comment.)"""
    tr1, ds1 = _mk(tmp_path, "rbg1", prng_impl="rbg")
    tr2, ds2 = _mk(tmp_path, "rbg2", prng_impl="rbg")
    m1 = tr1.train_one_epoch(ds1["training"], denoise=False)
    m2 = tr2.train_one_epoch(ds2["training"], denoise=False)
    assert np.isfinite(m1["loss"])
    np.testing.assert_array_equal(m1["loss"], m2["loss"])
    p1 = jax.tree_util.tree_leaves(tr1.params)
    p2 = jax.tree_util.tree_leaves(tr2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_eval_interval_bit_identical(tmp_path):
    """eval_interval>1 defers the loss fetch of intermediate fused epochs
    but dispatches the SAME steps with the SAME keys and the same
    closed-form "step" LR trajectory — so final params must be
    bit-identical to eval-every-epoch training, and only the eval cadence
    (summary records, checkpoint saves) may differ."""
    kw = dict(max_epochs=6, lr_decay_mode="step",
              lr_decay_step_or_patience=2, lr_decay_rate=0.5)
    tr1, _ = _mk(tmp_path, "ei1", eval_interval=1, **kw)
    tr3, _ = _mk(tmp_path, "ei3", eval_interval=3, **kw)
    tr1.train()
    tr3.train()
    assert abs(tr1.lr_schedule.lr - tr3.lr_schedule.lr) < 1e-12
    assert tr1.lr_schedule.num_steps == tr3.lr_schedule.num_steps
    p1 = jax.tree_util.tree_leaves(tr1.params)
    p3 = jax.tree_util.tree_leaves(tr3.params)
    for a, b in zip(p1, p3):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the deferred run validated only at its boundaries: epochs 3 and 5
    # (the final trained epoch is always an eval epoch)
    import json, os
    rows = [
        json.loads(line)
        for line in open(
            os.path.join(str(tmp_path / "ei3"), "summary", "events.jsonl")
        )
    ]
    valid_epochs = sorted({r["step"] for r in rows if r["scope"] == "valid"})
    assert valid_epochs == [3, 5]
    train_epochs = sorted({r["step"] for r in rows if r["scope"] == "train"})
    assert train_epochs == [1, 2, 3, 4, 5]


@pytest.mark.slow
def test_eval_interval_plateau_and_early_stop(tmp_path):
    """plateau + eval_interval: the schedule steps once per eval (patience
    counts evals), training still completes, and the LR stays clamped;
    early-stop fires at an eval boundary when no metric improves."""
    tr, _ = _mk(
        tmp_path, "ei_plat", eval_interval=2, max_epochs=8,
        lr_decay_mode="plateau", lr_decay_step_or_patience=0,
        lr_decay_rate=0.5, early_stopping=1,
    )
    m = tr.train()
    assert np.isfinite(m["loss"])
    # evals happened at epochs 2,4,... => schedule stepped once per eval
    assert tr.lr_schedule.num_steps < tr.epoch - 1
    assert tr.cfg.min_lr <= tr.lr_schedule.lr <= tr.cfg.init_lr


def test_rng_draw_bits_modes(tmp_path):
    """Both rng_draw_bits widths train (finite losses) and stay keyed-
    deterministic under threefry; the two widths draw different streams,
    so their trajectories differ."""
    tr16a, ds16a = _mk(tmp_path, "db16a", rng_draw_bits=16)
    tr16b, ds16b = _mk(tmp_path, "db16b", rng_draw_bits=16)
    tr32, ds32 = _mk(tmp_path, "db32", rng_draw_bits=32)
    m16a = tr16a.train_one_epoch(ds16a["training"], denoise=False)
    m16b = tr16b.train_one_epoch(ds16b["training"], denoise=False)
    m32 = tr32.train_one_epoch(ds32["training"], denoise=False)
    assert np.isfinite(m16a["loss"]) and np.isfinite(m32["loss"])
    np.testing.assert_array_equal(m16a["loss"], m16b["loss"])
    assert not np.array_equal(m16a["loss"], m32["loss"])


def test_eval_interval_on_mesh(tmp_path):
    """The deferred-dispatch window runs on the 8-device data mesh (drop-
    last batching, no tail step) and produces finite metrics at the
    boundary drain."""
    from deep_interpolation_clustering_tpu.parallel import make_mesh

    cfg = Config(
        batch_size=16, num_timestamps=16, max_epochs=4, eval_interval=3,
        log_train_freq=1000, log_valid_freq=1000,
    )
    cohorts = process_splits(
        make_synthetic_cohorts(n_total=80, max_obs=16, seed=21),
        rng=np.random.RandomState(0),
    )
    ds = {c: ArrayDataset(cfg, d, c) for c, d in cohorts.items()}
    tr = Trainer(cfg, ds, str(tmp_path / "ei_mesh"), mesh=make_mesh(8),
                 use_tensorboard=False)
    m = tr.train()
    assert np.isfinite(m["loss"])
    assert tr.epoch == 4  # epochs 1-3 trained; eval at 3 (final boundary)


def test_unroll_epoch_on_mesh(tmp_path):
    """epoch_scan_unroll > 1 compiles and trains on the 8-device data mesh
    (including a scan length not divisible by the unroll factor)."""
    from deep_interpolation_clustering_tpu.parallel import make_mesh

    cfg = Config(
        batch_size=16, num_timestamps=16, max_epochs=2,
        log_train_freq=1000, log_valid_freq=1000, epoch_scan_unroll=3,
    )
    cohorts = process_splits(
        make_synthetic_cohorts(n_total=80, max_obs=16, seed=21),
        rng=np.random.RandomState(0),
    )
    ds = {c: ArrayDataset(cfg, d, c) for c, d in cohorts.items()}
    tr = Trainer(cfg, ds, str(tmp_path / "unroll_mesh"), mesh=make_mesh(8),
                 use_tensorboard=False)
    m = tr.train_one_epoch(ds["training"], denoise=False)
    assert np.isfinite(m["loss"])
