"""End-to-end trainer tests on a tiny synthetic cohort (CPU, 8 virtual devices)."""

import os

import numpy as np
import pytest

import jax

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.data import (
    ArrayDataset,
    make_synthetic_cohorts,
    process_splits,
)
from deep_interpolation_clustering_tpu.parallel import make_mesh
from deep_interpolation_clustering_tpu.train import Trainer, ClusterTrainer
from deep_interpolation_clustering_tpu.train.optim import LRSchedule


def tiny_cfg(**kw):
    base = dict(
        batch_size=16,
        num_timestamps=24,
        max_epochs=3,
        early_stopping=50,
        log_train_freq=1000,
        log_valid_freq=1000,
        kmeans_n_init=3,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def cohorts():
    raw = make_synthetic_cohorts(n_total=120, max_obs=24, seed=11)
    return process_splits(raw, rng=np.random.RandomState(0))


def make_datasets(cfg, cohorts):
    return {c: ArrayDataset(cfg, d, c) for c, d in cohorts.items()}


@pytest.mark.slow
def test_pretrain_trainer_loss_decreases(tmp_path, cohorts):
    cfg = tiny_cfg(max_epochs=4)
    tr = Trainer(cfg, make_datasets(cfg, cohorts), str(tmp_path), use_tensorboard=False)
    m1, _ = tr.eval_one_epoch("valid", tr.datasets["validation"], denoise=False)
    tr.train()
    m2, _ = tr.eval_one_epoch("valid", tr.datasets["validation"], denoise=False)
    assert m2["ae_mse"] < m1["ae_mse"]
    # per-metric best checkpoints written
    assert os.path.exists(tmp_path / "weight" / "loss" / "checkpoint.npz")
    assert os.path.exists(tmp_path / "weight" / "ae_mse" / "checkpoint.npz")


@pytest.mark.slow
def test_pretrain_eval_dump_roundtrip(tmp_path, cohorts):
    cfg = tiny_cfg(max_epochs=2)
    tr = Trainer(cfg, make_datasets(cfg, cohorts), str(tmp_path), use_tensorboard=False)
    tr.train()
    ob_pred = tr.eval("testing", generate_feat=True)
    n = len(tr.datasets["testing"])
    assert ob_pred["hidden"].shape == (n, cfg.dim_enc_hidden)
    assert ob_pred["rec_ob"].shape == (n, cfg.num_variables, 24)
    # re-normalized to physical units: sbp values at observed points in range
    sbp = ob_pred["ob"][:, 0][ob_pred["padding_mask"][:, 0] > 0]
    assert sbp.min() >= 20.0 and sbp.max() <= 300.0
    path = tmp_path / "out_feat" / cfg.restore_metric / "testing.npy"
    assert path.exists()
    loaded = np.load(path, allow_pickle=True).item()
    np.testing.assert_array_equal(loaded["hidden"], ob_pred["hidden"])


@pytest.mark.slow
def test_feat_dump_lean_keeps_p4_keys(tmp_path, cohorts):
    """feat_dump="lean" writes dump files without rec_ob but with every key
    p2/p4 load (LOAD_KEYS + host planes), and hidden matches "full" exactly."""
    from deep_interpolation_clustering_tpu.cluster.final import LOAD_KEYS

    cfg = tiny_cfg(max_epochs=2)
    tr = Trainer(cfg, make_datasets(cfg, cohorts), str(tmp_path / "full"),
                 use_tensorboard=False)
    tr.train()
    full = tr.eval("testing", generate_feat=True)
    tr.close()

    lean_cfg = tiny_cfg(max_epochs=2, feat_dump="lean")
    tr2 = Trainer(lean_cfg, make_datasets(lean_cfg, cohorts),
                  str(tmp_path / "lean"), use_tensorboard=False)
    tr2.train()
    lean = tr2.eval("testing", generate_feat=True)
    tr2.close()

    assert "rec_ob" not in lean
    for k in LOAD_KEYS:
        assert k in lean
    np.testing.assert_array_equal(lean["hidden"], full["hidden"])
    path = tmp_path / "lean" / "out_feat" / lean_cfg.restore_metric / "testing.npy"
    loaded = np.load(path, allow_pickle=True).item()
    assert "rec_ob" not in loaded and "hidden" in loaded


def test_eval_device_dumps_bit_identical(tmp_path, cohorts):
    """`device_dumps=True` must return the SAME values as the host fetch —
    it only moves where the D2H happens (DEC center init / delta eval
    consume these on device; over the axon tunnel skipping the fetch is the
    difference between ~3 min and ~1 s of p3 center init at 100k)."""
    cfg = tiny_cfg(max_epochs=1)
    tr = Trainer(cfg, make_datasets(cfg, cohorts), str(tmp_path), use_tensorboard=False)
    ds = tr.datasets["validation"]
    _, dev = tr.eval_one_epoch("valid", ds, False, dump_keys=("hidden",),
                               device_dumps=True)
    _, host = tr.eval_one_epoch("valid", ds, False, dump_keys=("hidden",))
    assert isinstance(dev["hidden"][0], jax.Array)
    assert isinstance(host["hidden"][0], np.ndarray)
    np.testing.assert_array_equal(
        np.asarray(dev["hidden"][0]), np.concatenate(host["hidden"])
    )


@pytest.mark.slow
def test_dec_delta_matches_host_recompute(tmp_path, cohorts):
    """generate_pred_cluster's on-device argmax + delta must equal the
    host-side recompute from fetched soft assignments (reference
    clustering_trainer.py:118-124 semantics)."""
    pre_cfg = tiny_cfg(max_epochs=2)
    pre_path = str(tmp_path / "pre")
    pre = Trainer(pre_cfg, make_datasets(pre_cfg, cohorts), pre_path,
                  use_tensorboard=False)
    pre.train()
    pre.close()

    cfg = tiny_cfg(loss="ae_mse_sup_fake_detect_kl", cluster_number=3,
                   stopping_delta=None, max_epochs=1)
    tr = ClusterTrainer(cfg, make_datasets(cfg, cohorts), str(tmp_path / "dec"),
                        pretrain_exp_path=pre_path, use_tensorboard=False)
    valid_prev = tr.init_centers()
    ds = tr.datasets["validation"]
    delta, _, pred, _ = tr.generate_pred_cluster("valid", ds, valid_prev)
    # host recompute from the fetched dump (the pre-r4 path)
    _, dumps = tr.eval_one_epoch("valid", ds, False, dump_keys=("cluster_pred",))
    host_pred = np.argmax(np.concatenate(dumps["cluster_pred"]), axis=1)
    np.testing.assert_array_equal(np.asarray(pred), host_pred)
    prev = np.asarray(valid_prev)
    assert delta == float(np.sum(host_pred != prev) / prev.shape[0])
    tr.close()


@pytest.mark.slow
def test_trainer_restore_continues(tmp_path, cohorts):
    from deep_interpolation_clustering_tpu.train import checkpoint as ckpt

    cfg = tiny_cfg(max_epochs=3)
    tr = Trainer(cfg, make_datasets(cfg, cohorts), str(tmp_path), use_tensorboard=False)
    tr.train()
    best_epoch = tr.flag_dict.best_epoch["ae_mse"]

    cfg2 = tiny_cfg(max_epochs=3, restore=True, restore_metric="ae_mse")
    tr2 = Trainer(cfg2, make_datasets(cfg2, cohorts), str(tmp_path), use_tensorboard=False)
    tr2.load_weight()
    assert tr2.epoch == best_epoch
    # restored params are exactly the checkpointed ones, leaf for leaf
    ckpt_path = tmp_path / "weight" / "ae_mse" / ckpt.CKPT_NAME
    _, saved_params, saved_state, _, _ = ckpt.load_checkpoint(str(ckpt_path))
    restored = jax.device_get(tr2.params)
    flat_saved = jax.tree_util.tree_leaves_with_path(saved_params)
    flat_restored = dict(jax.tree_util.tree_leaves_with_path(restored))
    assert len(flat_saved) == len(flat_restored)
    for path, leaf in flat_saved:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_restored[path]))
    m, _ = tr2.eval_one_epoch("valid", tr2.datasets["validation"], denoise=False)
    assert np.isfinite(m["loss"])


@pytest.mark.slow
def test_restore_preserves_best_flags(tmp_path, cohorts):
    """A resumed run's first (worse) epoch must NOT overwrite the best
    checkpoints: flag state persists in the checkpoint meta and is
    min-merged across metric dirs on restore. The torch reference loses it
    (utils.py:126-138 re-creates the flag dict at inf on every run), so
    resume there regresses best checkpoints — this exceeds it."""
    from deep_interpolation_clustering_tpu.train import checkpoint as ckpt

    cfg = tiny_cfg(max_epochs=4)
    tr = Trainer(cfg, make_datasets(cfg, cohorts), str(tmp_path), use_tensorboard=False)
    tr.train()
    best = dict(tr.flag_dict.best)
    best_epoch = dict(tr.flag_dict.best_epoch)
    ae_path = tmp_path / "weight" / "ae_mse" / ckpt.CKPT_NAME
    before = ae_path.read_bytes()

    cfg2 = tiny_cfg(restore=True, restore_metric="ae_mse")
    tr2 = Trainer(cfg2, make_datasets(cfg2, cohorts), str(tmp_path), use_tensorboard=False)
    tr2.load_weight()
    # flags restored exactly, for every monitored metric with a checkpoint
    for m, v in best.items():
        if np.isfinite(v):
            assert tr2.flag_dict.best[m] == v
            assert tr2.flag_dict.best_epoch[m] == best_epoch[m]

    # a strictly worse epoch after resume does not touch the best checkpoint
    worse = {m: v * 2 + 1.0 for m, v in best.items() if np.isfinite(v)}
    tr2.epoch += 1
    tr2.aly_pred("valid", dict(worse))
    assert ae_path.read_bytes() == before

    # ... while a genuinely better epoch still does
    better = {m: v / 2 for m, v in best.items() if np.isfinite(v)}
    tr2.epoch += 1
    tr2.aly_pred("valid", dict(better))
    assert ae_path.read_bytes() != before


def test_checkpoint_opt_layout_mismatch_degrades(tmp_path):
    """A checkpoint whose optimizer-state layout doesn't match the current
    template (e.g. one written before the flat-vector optimizer) must
    restore params and warn, not crash the resume."""
    from deep_interpolation_clustering_tpu.train import checkpoint as ckpt

    params = {"w": np.ones((3, 2), np.float32)}
    state = {"bn": np.zeros((2,), np.float32)}
    old_opt = [np.zeros((3, 2), np.float32)] * 4  # old per-leaf layout
    path = str(tmp_path / "checkpoint.npz")
    ckpt.save_checkpoint(path, 7, params, state, old_opt)

    template = [np.zeros((6,), np.float32)]  # new flat layout: 1 leaf
    epoch, p, s, opt, meta = ckpt.load_checkpoint(path, opt_state_template=template)
    assert epoch == 7 and opt is None
    np.testing.assert_array_equal(p["w"], params["w"])


def test_data_parallel_all_devices(tmp_path, cohorts):
    """data_parallel=-1 builds a mesh over every local device; 0 stays
    single-device (no silent 1-chip training on multi-chip hardware when
    the user asked for all of them)."""
    cfg = tiny_cfg(data_parallel=-1)
    tr = Trainer(cfg, make_datasets(cfg, cohorts), str(tmp_path), use_tensorboard=False)
    assert tr.n_shards == len(jax.devices())
    cfg0 = tiny_cfg()
    tr0 = Trainer(cfg0, make_datasets(cfg0, cohorts), str(tmp_path), use_tensorboard=False)
    assert tr0.n_shards == 1


def test_mesh_cohort_smaller_than_batch_trains(tmp_path, cohorts):
    """Under a mesh, a cohort smaller than batch_size trains as ONE padded
    masked batch (r4 — earlier rounds dropped sub-batch cohorts on meshes
    and raised; the reference, with no drop_last, trains the short batch)."""
    cfg = tiny_cfg(batch_size=512, data_parallel=-1)
    tr = Trainer(cfg, make_datasets(cfg, cohorts), str(tmp_path), use_tensorboard=False)
    m = tr.train_one_epoch(tr.datasets["training"], denoise=False)
    assert np.isfinite(m["loss"])


@pytest.mark.slow
def test_restore_resumes_lr_schedule(tmp_path, cohorts):
    """A resumed 'step'-mode run must CONTINUE the decayed LR trajectory.
    The closed-form step decay recomputes from num_steps, so restoring
    only the rate (the old behavior) jumped back to init_lr on the first
    resumed epoch."""
    cfg = tiny_cfg(max_epochs=4, lr_decay_step_or_patience=1, lr_decay_rate=0.5)
    tr = Trainer(cfg, make_datasets(cfg, cohorts), str(tmp_path), use_tensorboard=False)
    tr.train()

    cfg2 = tiny_cfg(
        max_epochs=4, lr_decay_step_or_patience=1, lr_decay_rate=0.5,
        restore=True, restore_metric="ae_mse",
    )
    tr2 = Trainer(cfg2, make_datasets(cfg2, cohorts), str(tmp_path), use_tensorboard=False)
    tr2.load_weight()
    e = tr2.epoch
    assert tr2.lr_schedule.num_steps == e
    assert tr2.lr_schedule.lr == pytest.approx(cfg.init_lr * 0.5**e)
    # the next epoch's step continues the decay instead of restarting
    nxt = tr2.lr_schedule.step(1.0)
    assert nxt == pytest.approx(max(cfg.init_lr * 0.5 ** (e + 1), cfg.min_lr))


@pytest.mark.slow
def test_cluster_trainer_end_to_end(tmp_path, cohorts):
    pre_cfg = tiny_cfg(max_epochs=2)
    pre_path = str(tmp_path / "pretrain")
    pre = Trainer(pre_cfg, make_datasets(pre_cfg, cohorts), pre_path, use_tensorboard=False)
    pre.train()

    cfg = tiny_cfg(
        max_epochs=3,
        loss="ae_mse_sup_fake_detect_kl",
        cluster_number=3,
        stopping_delta=None,
    )
    tr = ClusterTrainer(
        cfg,
        make_datasets(cfg, cohorts),
        str(tmp_path / "cluster"),
        pretrain_exp_path=pre_path,
        use_tensorboard=False,
    )
    valid = tr.train()
    assert "delta" in valid and "kl" in valid
    ob_pred = tr.eval("testing", generate_feat=True)
    n = len(tr.datasets["testing"])
    # p4 'dl' path requirements: cluster_pred/cluster_label retained
    assert ob_pred["cluster_pred"].shape == (n, 3)
    assert ob_pred["cluster_label"].shape == (n, 3)
    np.testing.assert_allclose(ob_pred["cluster_pred"].sum(1), 1.0, rtol=1e-4)


@pytest.mark.slow
def test_sharded_trainer_matches_single_device(tmp_path):
    """Data-parallel over the 8-device CPU mesh must reproduce the
    single-device run numerically (global-batch BN + loss reductions) over
    TWO full epochs — where reduction-order drift would compound — down to
    final params and dumped latents. Cohort sized so the train split
    divides the batch evenly; both mesh sizes then see identical batches.

    Measured drift (the bounds asserted are ~10x the measurement):
    per-epoch losses ~1e-7, valid ae_mse ~1e-4, latents ~1e-5; a few
    near-zero-gradient params reach ~1e-3 because Adam's eps denominator
    amplifies reduction-order noise (same mechanism as the torch train-step
    parity test), so params get a 0.1%-of-elements/5e-3 bound instead of a
    uniform one."""
    raw = make_synthetic_cohorts(
        n_total=160, max_obs=24, seed=12, split=(0.8, 0.1, 0.1)
    )
    cohorts = process_splits(raw, rng=np.random.RandomState(0))
    cfg = tiny_cfg(max_epochs=2, batch_size=16)
    ds1 = make_datasets(cfg, cohorts)
    ds8 = make_datasets(cfg, cohorts)

    tr1 = Trainer(cfg, ds1, str(tmp_path / "one"), mesh=make_mesh(1), use_tensorboard=False)
    tr8 = Trainer(cfg, ds8, str(tmp_path / "eight"), mesh=make_mesh(8), use_tensorboard=False)

    for _ in range(2):
        m1 = tr1.train_one_epoch(ds1["training"], denoise=False)
        m8 = tr8.train_one_epoch(ds8["training"], denoise=False)
        # same seed, same data, same GLOBAL-batch reduction semantics
        assert abs(m1["loss"] - m8["loss"]) < 1e-5
        tr1.epoch += 1
        tr8.epoch += 1

    # final params leaf for leaf
    p1 = dict(jax.tree_util.tree_leaves_with_path(jax.device_get(tr1.params)))
    p8 = jax.tree_util.tree_leaves_with_path(jax.device_get(tr8.params))
    assert len(p1) == len(p8)
    n_viol = n_tot = 0
    for path, leaf in p8:
        diff = np.abs(np.asarray(leaf) - np.asarray(p1[path]))
        assert diff.max() < 5e-3, f"param drift at {path}: {diff.max():.2e}"
        n_viol += int((diff > 1e-4).sum())
        n_tot += diff.size
    assert n_viol <= max(1, n_tot // 1000), f"{n_viol}/{n_tot} params beyond 1e-4"

    # eval metrics + dumped latents (what p2-p4 actually consume)
    v1, d1 = tr1.eval_one_epoch(
        "valid", ds1["validation"], denoise=False, dump_keys=("hidden",)
    )
    v8, d8 = tr8.eval_one_epoch(
        "valid", ds8["validation"], denoise=False, dump_keys=("hidden",)
    )
    assert abs(v1["ae_mse"] - v8["ae_mse"]) < 5e-4
    h1 = np.concatenate(d1["hidden"])
    h8 = np.concatenate(d8["hidden"])
    assert np.abs(h1 - h8).max() < 1e-4


def test_masked_tail_step_matches_true_short_batch(tmp_path, cohorts):
    """The padded+masked tail step must reproduce the TRUE short-batch step
    (what the reference and earlier single-device rounds ran): mask-weighted
    BN moments == short-batch BN moments, masked losses == short-batch
    losses, zero gradient leakage from the padding rows. RNG-shape-dependent
    branches (dropout/augment/fake draws differ between (B,) and (n_tail,)
    shapes) are disabled — they carry no parity contract."""
    import jax.numpy as jnp

    from deep_interpolation_clustering_tpu.train.optim import make_optimizer
    from deep_interpolation_clustering_tpu.train.steps import make_train_step
    from deep_interpolation_clustering_tpu.models import init_net

    cfg = tiny_cfg(
        batch_size=16, dropout=0.0, aug_input=False, fake_detection=False,
        loss="ae_mse_sup",
    )
    ds = make_datasets(cfg, cohorts)["training"]
    data = {k: jnp.asarray(v) for k, v in ds.arrays().items()}
    key = jax.random.key(0)
    params, state = init_net(jax.random.key(1), cfg)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)

    def fresh():
        # the steps donate their carries; give each call its own buffers
        return jax.tree_util.tree_map(
            jnp.copy, (params, state, opt_state)
        )

    tail = np.arange(5, dtype=np.int32)  # a 5-row tail of a 16-batch epoch
    short = make_train_step(cfg, opt, denoise=False, gather=True)
    p0, s0, o0 = fresh()
    p_s, st_s, _, l_s = short(p0, s0, o0, data, jnp.asarray(tail), key)

    masked = make_train_step(cfg, opt, denoise=False, gather=True, masked=True)
    idx_pad = np.resize(tail, cfg.batch_size)
    mask = np.zeros((cfg.batch_size,), np.float32)
    mask[: len(tail)] = 1.0
    p0, s0, o0 = fresh()
    p_m, st_m, _, l_m = masked(p0, s0, o0, data,
                               jnp.asarray(idx_pad), jnp.asarray(mask), key)

    for k in l_s:
        np.testing.assert_allclose(
            float(l_s[k]), float(l_m[k]), rtol=1e-6, err_msg=f"loss {k}")
    # params: gradient sums reduce over B padded rows (zero cotangents) vs
    # n_tail rows — f32 reduction-order drift that Adam's eps denominator
    # amplifies on near-zero gradients (measured 1.4e-5 to 1.0e-4 max
    # across sessions on <=0.03% of elements; same mechanism and band as
    # sharded-vs-single above). Band: 2x the worst observed single element.
    n_viol = n_tot = 0
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(p_s)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(p_m)),
    ):
        diff = np.abs(np.asarray(a) - np.asarray(b))
        assert diff.max() < 2e-4, f"param drift at {path}: {diff.max():.2e}"
        n_viol += int((diff > 1e-5).sum())
        n_tot += diff.size
    assert n_viol <= max(1, n_tot // 1000), f"{n_viol}/{n_tot} beyond 1e-5"
    # BN running stats (the batch-coupled state) match the short batch's
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(st_s)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(st_m)),
    ):
        np.testing.assert_allclose(
            a, b, rtol=1e-5, atol=1e-7, err_msg=f"state {path}")


@pytest.mark.slow
def test_sharded_ragged_tail_matches_single_device(tmp_path):
    """An 8-shard epoch over a NON-divisible cohort must (a) train every
    encounter — the tail runs as a padded masked step on the mesh, where
    earlier rounds silently dropped it — and (b) match the single-device
    run at the established sharded-vs-single band over two epochs."""
    raw = make_synthetic_cohorts(
        n_total=150, max_obs=24, seed=12, split=(0.8, 0.1, 0.1)
    )
    cohorts = process_splits(raw, rng=np.random.RandomState(0))
    cfg = tiny_cfg(max_epochs=2, batch_size=16)
    ds1 = make_datasets(cfg, cohorts)
    ds8 = make_datasets(cfg, cohorts)
    n_train = len(ds1["training"])
    assert n_train % cfg.batch_size != 0  # the point of the test

    tr1 = Trainer(cfg, ds1, str(tmp_path / "one"), mesh=make_mesh(1), use_tensorboard=False)
    tr8 = Trainer(cfg, ds8, str(tmp_path / "eight"), mesh=make_mesh(8), use_tensorboard=False)

    for _ in range(2):
        m1 = tr1.train_one_epoch(ds1["training"], denoise=False)
        m8 = tr8.train_one_epoch(ds8["training"], denoise=False)
        assert abs(m1["loss"] - m8["loss"]) < 1e-5
        tr1.epoch += 1
        tr8.epoch += 1

    p1 = dict(jax.tree_util.tree_leaves_with_path(jax.device_get(tr1.params)))
    p8 = jax.tree_util.tree_leaves_with_path(jax.device_get(tr8.params))
    n_viol = n_tot = 0
    for path, leaf in p8:
        diff = np.abs(np.asarray(leaf) - np.asarray(p1[path]))
        assert diff.max() < 5e-3, f"param drift at {path}: {diff.max():.2e}"
        n_viol += int((diff > 1e-4).sum())
        n_tot += diff.size
    # 0.3%-of-elements bound: the divisible-cohort test above measured
    # ~0.1%; the masked tail adds one more reduction-order-shifted step per
    # epoch for Adam's eps to amplify (measured 0.14% here)
    assert n_viol <= max(1, 3 * n_tot // 1000), \
        f"{n_viol}/{n_tot} params beyond 1e-4"


def test_lr_schedules():
    cfg = Config(init_lr=1.0, lr_decay_step_or_patience=2, lr_decay_rate=0.1, min_lr=1e-3)
    s = LRSchedule(cfg)
    assert s.step() == 1.0  # epoch 1 done; floor(1/2)=0
    assert s.step() == pytest.approx(0.1)  # floor(2/2)=1
    assert s.step() == pytest.approx(0.1)
    assert s.step() == pytest.approx(0.01)
    for _ in range(10):
        lr = s.step()
    assert lr == pytest.approx(1e-3)  # min clamp

    cfg = Config(init_lr=1.0, lr_decay_mode="plateau", lr_decay_step_or_patience=1, lr_decay_rate=0.5)
    s = LRSchedule(cfg)
    assert s.step(1.0) == 1.0
    assert s.step(0.5) == 1.0  # improvement
    assert s.step(0.6) == 1.0  # bad 1
    assert s.step(0.6) == 0.5  # bad 2 > patience -> decay

    cfg = Config(init_lr=1.0, lr_decay_mode="warmup", warmup_multiplier=8, warmup_epochs=10,
                 lr_decay_step_or_patience=20, lr_decay_rate=0.2)
    s = LRSchedule(cfg)
    lrs = [s.step() for _ in range(10)]
    assert lrs[0] == pytest.approx(1.7)
    assert lrs[-1] == pytest.approx(8.0)
