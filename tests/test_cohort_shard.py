"""Row-sharded cohort storage (parallel/cohort.ShardedCohort) — the
multi-chip HBM path. The contract: per-device memory = cohort/D (not a full
replica per device), with batches, RNG and numerics IDENTICAL to the
replicated design on the same mesh (the epoch relayout permutes storage into
the host shuffle order, so block k == the batch the replicated gather would
assemble). Runs on the conftest's 8-virtual-CPU-device platform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_interpolation_clustering_tpu.data.loader import ArrayDataset
from deep_interpolation_clustering_tpu.data.synthetic import make_synthetic_cohorts
from deep_interpolation_clustering_tpu.data.preprocess import process_splits
from deep_interpolation_clustering_tpu.parallel import ShardedCohort, make_mesh
from deep_interpolation_clustering_tpu.train.trainer import Trainer

from test_trainer import make_datasets, tiny_cfg


def _random_planes(rng, n, shapes):
    return {
        k: rng.randn(n, *s).astype(np.float32) for k, s in shapes.items()
    }


def test_relayout_matches_numpy_permutation(rng):
    mesh = make_mesh(8)
    n, b = 77, 16  # ragged: nb = 5 blocks, tail of 13
    arrays = _random_planes(rng, n, {"a": (3, 7), "c": (2,)})
    cohort = ShardedCohort(mesh, arrays, b)

    # initial layout is the clamped identity (eval-ready)
    ident = cohort.identity_order()
    for k, v in arrays.items():
        got = np.asarray(cohort.data3[k]).reshape((cohort.nb * b,) + v.shape[1:])
        np.testing.assert_array_equal(got, v[ident.reshape(-1)])

    # two successive epoch relayouts are exact (bit-level) permutations
    for seed in (3, 4):
        order = np.arange(n)
        np.random.RandomState(seed).shuffle(order)
        tgt = cohort.epoch_order(order)
        cohort.ensure(tgt)
        for k, v in arrays.items():
            got = np.asarray(cohort.data3[k]).reshape(
                (cohort.nb * b,) + v.shape[1:]
            )
            np.testing.assert_array_equal(got, v[tgt.reshape(-1)])
        # tail block is the cyclic wrap of the short batch
        np.testing.assert_array_equal(
            tgt[-1], np.resize(order[(n // b) * b :], b)
        )

    # back to identity (the eval layout) from an arbitrary epoch order
    cohort.ensure(cohort.identity_order())
    for k, v in arrays.items():
        got = np.asarray(cohort.data3[k]).reshape((cohort.nb * b,) + v.shape[1:])
        np.testing.assert_array_equal(got, v[ident.reshape(-1)])

    # ensure() with the current order is a no-op (no new relayout compile)
    fns_before = dict(cohort._relayout_fns)
    cohort.ensure(cohort.identity_order())
    assert cohort._relayout_fns == fns_before


def test_storage_is_row_sharded(rng):
    """The point of the design: each device holds 1/D of the cohort, and
    the block axis is whole on every device (shard-local slicing)."""
    mesh = make_mesh(8)
    n, b = 64, 16
    arrays = _random_planes(rng, n, {"a": (3, 7)})
    cohort = ShardedCohort(mesh, arrays, b)
    v = cohort.data3["a"]
    for shard in v.addressable_shards:
        assert shard.data.shape == (cohort.nb, b // 8, 3, 7)
    total = sum(x.nbytes for x in arrays.values())
    per_dev = cohort.nbytes_per_device()
    # nb*B rows vs n rows: padding adds at most one block
    assert per_dev <= (total / 8) * (cohort.nb * b / n) + 1
    assert per_dev < total / 4  # far below a replica


@pytest.fixture(scope="module")
def ragged_cohorts():
    raw = make_synthetic_cohorts(
        n_total=150, max_obs=24, seed=12, split=(0.8, 0.1, 0.1)
    )
    return process_splits(raw, rng=np.random.RandomState(0))


def _leaf_dict(tree):
    return dict(jax.tree_util.tree_leaves_with_path(jax.device_get(tree)))


def test_sharded_cohort_trainer_matches_replicated(tmp_path, ragged_cohorts):
    """Two epochs of the production fused path on the 8-device mesh, same
    shuffle, sharded vs replicated cohort storage: identical batches ->
    same losses and params to float-reduction tolerance (the two paths
    build the same per-step batch; only gather-vs-slice scheduling
    differs), and identical eval dumps."""
    cfg_s = tiny_cfg(max_epochs=2, batch_size=16, shard_cohort=True)
    cfg_r = tiny_cfg(max_epochs=2, batch_size=16, shard_cohort=False)
    ds_s = make_datasets(cfg_s, ragged_cohorts)
    ds_r = make_datasets(cfg_r, ragged_cohorts)
    assert len(ds_s["training"]) % cfg_s.batch_size != 0  # ragged tail

    tr_s = Trainer(cfg_s, ds_s, str(tmp_path / "s"), mesh=make_mesh(8),
                   use_tensorboard=False)
    tr_r = Trainer(cfg_r, ds_r, str(tmp_path / "r"), mesh=make_mesh(8),
                   use_tensorboard=False)
    assert tr_s._shard_cohort and not tr_r._shard_cohort

    for _ in range(2):
        m_s = tr_s.train_one_epoch(ds_s["training"], denoise=False)
        m_r = tr_r.train_one_epoch(ds_r["training"], denoise=False)
        assert abs(m_s["loss"] - m_r["loss"]) < 1e-6
        tr_s.epoch += 1
        tr_r.epoch += 1

    p_r = _leaf_dict(tr_r.params)
    for path, leaf in jax.tree_util.tree_leaves_with_path(
        jax.device_get(tr_s.params)
    ):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(p_r[path]), rtol=1e-6, atol=1e-6,
            err_msg=f"param {path}",
        )

    # fused eval: metrics and latent dumps match, in original row order
    met_s, dmp_s = tr_s.eval_one_epoch(
        "valid", ds_s["validation"], denoise=False, dump_keys=("hidden",)
    )
    met_r, dmp_r = tr_r.eval_one_epoch(
        "valid", ds_r["validation"], denoise=False, dump_keys=("hidden",)
    )
    for k in met_r:
        assert abs(met_s[k] - met_r[k]) < 1e-6, k
    np.testing.assert_allclose(
        np.concatenate(dmp_s["hidden"]), np.concatenate(dmp_r["hidden"]),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.concatenate(dmp_s["__index__"]), np.concatenate(dmp_r["__index__"])
    )


def test_sharded_cohort_per_batch_path(tmp_path, ragged_cohorts):
    """The unfused (per-batch) stepping and eval also run on block storage
    (fused_epoch=False), matching the replicated per-batch path."""
    cfg_s = tiny_cfg(batch_size=16, fused_epoch=False, shard_cohort=True)
    cfg_r = tiny_cfg(batch_size=16, fused_epoch=False, shard_cohort=False)
    ds_s = make_datasets(cfg_s, ragged_cohorts)
    ds_r = make_datasets(cfg_r, ragged_cohorts)
    tr_s = Trainer(cfg_s, ds_s, str(tmp_path / "s"), mesh=make_mesh(8),
                   use_tensorboard=False)
    tr_r = Trainer(cfg_r, ds_r, str(tmp_path / "r"), mesh=make_mesh(8),
                   use_tensorboard=False)
    m_s = tr_s.train_one_epoch(ds_s["training"], denoise=False)
    m_r = tr_r.train_one_epoch(ds_r["training"], denoise=False)
    assert abs(m_s["loss"] - m_r["loss"]) < 1e-6
    met_s, _ = tr_s.eval_one_epoch("valid", ds_s["validation"], denoise=False)
    met_r, _ = tr_r.eval_one_epoch("valid", ds_r["validation"], denoise=False)
    for k in met_r:
        assert abs(met_s[k] - met_r[k]) < 1e-6, k
