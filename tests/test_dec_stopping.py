"""DEC stopping rules (Config.stopping_mode) + the deferred eval_interval
cadence of the ClusterTrainer loop.

The reference's only criterion — label-change FRACTION < stopping_delta
(clustering_trainer.py:118-124) — provably cannot fire at 100k scale
(PARITY.md r4 negative result), so "count" and "patience" are the
usable-at-scale opt-ins; "delta" stays the default."""

import numpy as np
import pytest

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.data import (
    ArrayDataset,
    make_synthetic_cohorts,
    process_splits,
)
from deep_interpolation_clustering_tpu.train import ClusterTrainer


def dec_cfg(**kw):
    base = dict(
        batch_size=16, num_timestamps=24, max_epochs=4,
        loss="ae_mse_sup_fake_detect_kl", cluster_number=3,
        init_cluster_center="none", kmeans_n_init=3,
        log_train_freq=1000, log_valid_freq=1000,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def cohorts():
    raw = make_synthetic_cohorts(n_total=120, max_obs=24, seed=11)
    return process_splits(raw, rng=np.random.RandomState(0))


def make_trainer(tmp_path, cohorts, name, **kw):
    cfg = dec_cfg(**kw)
    ds = {c: ArrayDataset(cfg, d, c) for c, d in cohorts.items()}
    return ClusterTrainer(cfg, ds, str(tmp_path / name), use_tensorboard=False)


# ---------------------------------------------------------------- unit
def _bare(cfg):
    """A ClusterTrainer shell with only the state _should_stop reads."""
    tr = ClusterTrainer.__new__(ClusterTrainer)
    tr.cfg = cfg
    tr._best_delta = float("inf")
    tr._since_improve = 0
    return tr


def test_should_stop_delta_mode():
    tr = _bare(dec_cfg(stopping_mode="delta", stopping_delta=1e-4))
    assert tr._should_stop(1.0, None) is None
    assert tr._should_stop(2e-4, 3) is None
    assert "label delta" in tr._should_stop(5e-5, 1)
    # the reference honors stopping_delta=None as "never stop"
    assert _bare(dec_cfg(stopping_delta=None))._should_stop(0.0, 0) is None


def test_should_stop_count_mode():
    tr = _bare(dec_cfg(stopping_mode="count", stopping_count=2))
    assert tr._should_stop(1.0, None) is None  # first epoch: no prev labels
    assert tr._should_stop(0.5, 8) is None
    assert "changed-label count 2" in tr._should_stop(0.1, 2)
    assert "changed-label count 0" in tr._should_stop(0.0, 0)


def test_should_stop_patience_mode():
    tr = _bare(dec_cfg(stopping_mode="patience", stopping_patience=2))
    assert tr._should_stop(1.0, None) is None  # best = 1.0
    assert tr._should_stop(0.5, 5) is None  # improved, best = 0.5
    assert tr._should_stop(0.6, 6) is None  # 1 unimproved check
    msg = tr._should_stop(0.55, 4)  # 2 unimproved -> stop
    assert msg is not None and "unimproved for 2" in msg
    # improvement resets the counter
    tr2 = _bare(dec_cfg(stopping_mode="patience", stopping_patience=2))
    for d in (1.0, 0.5, 0.6, 0.4, 0.41):
        assert tr2._should_stop(d, 1) is None
    assert tr2._should_stop(0.42, 1) is not None


# ---------------------------------------------------------- integration
@pytest.mark.slow
def test_count_mode_run_stops(tmp_path, cohorts):
    """count mode with a permissive N must stop at the FIRST epoch that has
    previous labels to compare (epoch 1); a negative N never fires."""
    tr = make_trainer(tmp_path, cohorts, "count",
                      stopping_mode="count", stopping_count=10**9)
    tr.train()
    tr.close()
    # trainer epochs start at 1; epoch 1 has no prev labels, epoch 2 stops
    # (before incrementing, like the reference)
    assert tr.epoch == 2
    assert len(tr.delta_history) == 2

    tr2 = make_trainer(tmp_path, cohorts, "nocount",
                       stopping_mode="count", stopping_count=-1, max_epochs=3)
    tr2.train()
    tr2.close()
    assert tr2.epoch == tr2.cfg.max_epochs
    assert len(tr2.delta_history) == 2  # epochs 1..max_epochs-1


def _final_params(tr):
    import jax

    return jax.tree_util.tree_flatten(jax.device_get(tr.params))[0]


@pytest.mark.slow
def test_deferred_cadence_delta_bit_identical(tmp_path, cohorts):
    """eval_interval>1 defers every non-delta host fetch — the per-epoch
    delta trajectory AND the final weights must be bit-identical to the
    reference cadence (pipeline_delta's lagged variant is covered by
    test_pipeline_delta_stop_rollback_bit_identical)."""
    kw = dict(stopping_delta=None, max_epochs=5)
    a = make_trainer(tmp_path, cohorts, "cad1", eval_interval=1, **kw)
    a.train()
    a.close()
    b = make_trainer(tmp_path, cohorts, "cad3", eval_interval=3, **kw)
    b.train()
    b.close()
    assert a.delta_history == b.delta_history
    assert len(a.delta_history) == 4  # epochs 1..max_epochs-1
    for pa, pb in zip(_final_params(a), _final_params(b)):
        np.testing.assert_array_equal(pa, pb)
    # boundary checkpoints still written under the deferred cadence
    import os
    assert os.path.exists(
        tmp_path / "cad3" / "weight" / "delta" / "checkpoint.npz"
    )


@pytest.mark.slow
def test_pipeline_delta_stop_rollback_bit_identical(tmp_path, cohorts):
    """A stop that fires on the LAGGED changed-label scalar inside a
    pipelined (non-boundary) epoch must roll back the speculative
    dispatch: stopping epoch, delta trajectory and final weights all
    bit-identical to the unpipelined deferred cadence and to the
    reference eval_interval=1 cadence. With eval_interval=4 the count
    criterion fires at epoch 2, resolved mid-epoch-3 — the rollback path."""
    kw = dict(stopping_delta=None, stopping_mode="count",
              stopping_count=10**9, max_epochs=6)
    runs = {}
    for name, extra in {
        "ref": dict(eval_interval=1),
        "plain": dict(eval_interval=4, pipeline_delta=False),
        "piped": dict(eval_interval=4, pipeline_delta=True),
    }.items():
        tr = make_trainer(tmp_path, cohorts, name, **kw, **extra)
        tr.train()
        tr.close()
        runs[name] = (tr.epoch, list(tr.delta_history), _final_params(tr))
    e0, h0, p0 = runs["ref"]
    assert e0 == 2 and len(h0) == 2  # fires at the first comparable epoch
    for name in ("plain", "piped"):
        e, h, p = runs[name]
        assert (e, h) == (e0, h0), name
        for pa, pb in zip(p0, p):
            np.testing.assert_array_equal(pa, pb)


@pytest.mark.slow
def test_pipeline_delta_stop_at_boundary_top(tmp_path, cohorts):
    """The OTHER lagged-stop path: with eval_interval=3 the count
    criterion (fires at epoch 2) resolves at epoch 3's boundary TOP,
    before any dispatch — no rollback involved, the loop must cancel the
    boundary epoch entirely and report the same stop epoch/history as
    the reference cadence."""
    kw = dict(stopping_delta=None, stopping_mode="count",
              stopping_count=10**9, max_epochs=6)
    a = make_trainer(tmp_path, cohorts, "bref", eval_interval=1, **kw)
    a.train()
    a.close()
    b = make_trainer(tmp_path, cohorts, "btop", eval_interval=3,
                     pipeline_delta=True, **kw)
    b.train()
    b.close()
    assert (b.epoch, list(b.delta_history)) == (a.epoch, list(a.delta_history))
    assert a.epoch == 2
    for pa, pb in zip(_final_params(a), _final_params(b)):
        np.testing.assert_array_equal(pa, pb)


@pytest.mark.slow
def test_stop_epoch_checkpoint_candidacy(tmp_path, cohorts):
    """An early stop at a NON-boundary epoch of the deferred cadence must
    leave the stopping epoch's weights checkpoint-eligible: p3's
    post-train dumps restore via load_weight, and without the candidacy
    grant a count/patience stop mid-interval leaves the best checkpoints
    up to eval_interval-1 epochs behind the final in-memory weights —
    here, with the stop firing before the FIRST boundary, no valid
    checkpoint would exist at all. Covers all four stop paths: plain
    deferred, pipelined rollback, pipelined boundary-top, and the
    non-fused host-metrics path."""
    import jax

    from deep_interpolation_clustering_tpu.train.checkpoint import (
        load_checkpoint,
    )

    kw = dict(stopping_delta=None, stopping_mode="count",
              stopping_count=10**9, max_epochs=6)
    for name, extra in {
        "sc_plain": dict(eval_interval=4, pipeline_delta=False),
        "sc_piped": dict(eval_interval=4, pipeline_delta=True),
        "sc_btop": dict(eval_interval=3, pipeline_delta=True),
        "sc_nofuse": dict(eval_interval=4, fused_epoch=False),
    }.items():
        tr = make_trainer(tmp_path, cohorts, name, **kw, **extra)
        tr.train()
        tr.close()
        assert tr.epoch == 2, name  # stopped before the first boundary
        path = tmp_path / name / "weight" / "delta" / "checkpoint.npz"
        assert path.exists(), name
        epoch, params, _state, _, _ = load_checkpoint(str(path))
        assert epoch == tr.epoch, name
        live = jax.tree_util.tree_leaves(jax.device_get(tr.params))
        saved = jax.tree_util.tree_leaves(params)
        assert len(live) == len(saved), name
        for a, b in zip(live, saved):
            np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.slow
def test_deferred_cadence_on_mesh_matches_single(tmp_path, cohorts):
    """The deferred DEC cadence under an 8-device data mesh (single
    process, so the defer gate holds): its delta trajectory must match the
    single-device deferred run at the established sharded-vs-single band
    (global-batch reductions make the math mesh-invariant, not bit-equal —
    BN moments and grads reduce in a different order)."""
    from deep_interpolation_clustering_tpu.parallel import make_mesh

    kw = dict(stopping_delta=None, max_epochs=4, eval_interval=3)
    a = make_trainer(tmp_path, cohorts, "mesh1", **kw)
    a.train()
    a.close()

    cfg = dec_cfg(**kw)
    ds = {c: ArrayDataset(cfg, d, c) for c, d in cohorts.items()}
    b = ClusterTrainer(cfg, ds, str(tmp_path / "mesh8"), mesh=make_mesh(8),
                       use_tensorboard=False)
    b.train()
    b.close()
    assert len(a.delta_history) == len(b.delta_history) == 3
    for da, db in zip(a.delta_history, b.delta_history):
        # delta is a changed-label fraction over 24 validation rows: allow
        # one flipped borderline label per epoch for cross-mesh f32 drift
        assert abs(da - db) <= 1 / 24 + 1e-9, (a.delta_history, b.delta_history)
