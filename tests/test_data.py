"""Data-layer tests: p0 preprocessing, synthetic cohorts, loader transforms."""

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

from deep_interpolation_clustering_tpu.config import Config
from deep_interpolation_clustering_tpu.data import (
    ArrayDataset,
    augment_batch,
    extract_abnormal_vitals,
    generate_data,
    hold_out,
    make_fake_ob,
    make_synthetic_cohorts,
    mean_imputation,
    process_splits,
)
from deep_interpolation_clustering_tpu.info import MIN_MAX_VALUES, USE_FEATURES


def _small_frames(rng, n_enc=5):
    """Build tiny long-format vital frames with known contents."""
    eids = [f"e{i}" for i in range(n_enc)]
    frames = {}
    for v in USE_FEATURES:
        rows = []
        for i, eid in enumerate(eids):
            k = rng.randint(0, 6)
            ts = np.sort(rng.rand(k) * 6)
            for t in ts:
                rows.append((eid, t, rng.rand() * 50 + 50))
        frames[v] = pd.DataFrame(
            rows, columns=["encounter_deiden_id", "time_stamp", "measurement"]
        )
    return eids, frames


def test_generate_data_roundtrip(rng):
    eids, frames = _small_frames(rng)
    d = generate_data(eids, frames)
    n, c, t = d["feat"].shape
    assert n == len(eids) and c == len(USE_FEATURES)
    # front-packed: mask is a prefix of ones per (enc, channel)
    for i in range(n):
        for j in range(c):
            m = d["padding_mask"][i, j]
            k = int(m.sum())
            assert (m[:k] == 1).all() and (m[k:] == 0).all()
    # spot-check one channel's values against the frame
    j = 0
    df = frames[USE_FEATURES[0]]
    for i, eid in enumerate(eids):
        sub = df[df.encounter_deiden_id == eid]
        k = len(sub)
        np.testing.assert_allclose(
            d["feat"][i, j, :k], sub.measurement.to_numpy(), rtol=1e-6
        )
        np.testing.assert_allclose(
            d["time_step"][i, j, :k], sub.time_stamp.to_numpy(), rtol=1e-6
        )


def test_mean_imputation(rng):
    vit = rng.rand(10, 6, 8)
    mask = (rng.rand(10, 6, 8) < 0.5).astype(np.int8)
    mask[3, 2, :] = 0  # fully-missing channel
    mask[7, 4, :] = 0
    vit_before = vit.copy()
    mask_before = mask.copy()
    means = mean_imputation(vit, mask)
    assert mask[3, 2, 0] == 1 and mask[7, 4, 0] == 1
    assert vit[3, 2, 0] == means[2] and vit[7, 4, 0] == means[4]
    # train means reused for eval cohorts
    vit2 = rng.rand(4, 6, 8)
    mask2 = np.zeros((4, 6, 8), dtype=np.int8)
    mean_imputation(vit2, mask2, pre_mean=means)
    np.testing.assert_allclose(vit2[:, :, 0], np.broadcast_to(means, (4, 6)))
    # originally-observed values untouched
    np.testing.assert_array_equal(
        vit[mask_before.astype(bool)], vit_before[mask_before.astype(bool)]
    )


def test_hold_out_guard_and_fraction(rng):
    mask = np.zeros((3, 2, 50), dtype=np.int8)
    mask[0, 0, :30] = 1  # int(0.2*30)=6 > 1 -> drop 6
    mask[0, 1, :9] = 1   # int(0.2*9)=1 -> no drop
    mask[1, 0, :5] = 1   # int(0.2*5)=1 -> no drop
    mask[2, 1, :50] = 1  # drop 10
    dm = hold_out(mask, 0.2, rng)
    assert dm.shape == mask.shape
    assert (dm[mask == 0] == 0).all()
    assert (mask[0, 0] - dm[0, 0]).sum() == 6
    assert (mask[0, 1] - dm[0, 1]).sum() == 0
    assert (mask[1, 0] - dm[1, 0]).sum() == 0
    assert (mask[2, 1] - dm[2, 1]).sum() == 10


def test_process_splits_and_normalize():
    cohorts = make_synthetic_cohorts(n_total=60, seed=1)
    process_splits(cohorts, rng=np.random.RandomState(0))
    for cohort, d in cohorts.items():
        # every channel has >=1 observation post-imputation
        assert (d["padding_mask"].sum(axis=2) >= 1).all()
        # normalized to [0,1] where observed
        obs = d["feat"][d["padding_mask"].astype(bool)]
        assert obs.min() >= -1e-6 and obs.max() <= 1 + 1e-6
        assert "drop_mask" in d


def test_array_dataset_and_scaling():
    cohorts = make_synthetic_cohorts(n_total=60, seed=2)
    process_splits(cohorts, rng=np.random.RandomState(0))
    cfg = Config(batch_size=16)
    ds = ArrayDataset(cfg, cohorts["training"], "training")
    obs = ds.ob[ds.padding_mask.astype(bool)]
    assert obs.min() >= -2.5 - 1e-5 and obs.max() <= 2.5 + 1e-5
    batches = list(ds.iter_batches(16, shuffle=True, rng=np.random.RandomState(1)))
    assert sum(b["ob"].shape[0] for b in batches) == len(ds)
    assert {"future_vital", "future_vital_mask"} <= set(batches[0])
    assert ds.num_batches(16) == len(batches)


def test_make_fake_ob_properties(rng):
    cfg = Config()
    ob = rng.randn(4, 6, 20).astype(np.float32)
    mask = np.zeros((4, 6, 20), dtype=np.float32)
    counts = rng.randint(1, 20, size=(4, 6))
    for i in range(4):
        for j in range(6):
            mask[i, j, : counts[i, j]] = 1
    fake = np.asarray(
        make_fake_ob(jnp.asarray(ob), jnp.asarray(mask), jax.random.PRNGKey(0), 5.0)
    )
    changed = (fake != ob).sum(axis=2)
    want = np.maximum(1, (0.5 * counts).astype(int))
    # replaced count per channel == max(1, floor(0.5*n_valid)) (noise can
    # collide with the original value only with probability 0)
    np.testing.assert_array_equal(changed, want)
    # replacements only among valid slots, noise within scaled range
    assert ((fake != ob) <= (mask > 0)).all()
    assert fake[fake != ob].min() >= -2.5 and fake[fake != ob].max() <= 2.5


def test_make_fake_ob_draw_bits16(rng):
    """16-bit draws (Config.rng_draw_bits=16) keep every make_fake_ob
    property: exact-k replacement, valid-slot confinement, scaled-range
    noise, and keyed determinism — only the drawn stream differs from the
    32-bit path (half the threefry words; see data/loader.py)."""
    ob = rng.randn(4, 6, 20).astype(np.float32)
    mask = np.zeros((4, 6, 20), dtype=np.float32)
    counts = rng.randint(1, 20, size=(4, 6))
    for i in range(4):
        for j in range(6):
            mask[i, j, : counts[i, j]] = 1
    obj, maskj = jnp.asarray(ob), jnp.asarray(mask)
    key = jax.random.PRNGKey(0)
    fake = np.asarray(make_fake_ob(obj, maskj, key, 5.0, draw_bits=16))
    changed = (fake != ob).sum(axis=2)
    np.testing.assert_array_equal(changed, np.maximum(1, (0.5 * counts).astype(int)))
    assert ((fake != ob) <= (mask > 0)).all()
    assert fake[fake != ob].min() >= -2.5 and fake[fake != ob].max() <= 2.5
    np.testing.assert_array_equal(
        fake, np.asarray(make_fake_ob(obj, maskj, key, 5.0, draw_bits=16))
    )
    # the two widths draw genuinely different streams under one key
    fake32 = np.asarray(make_fake_ob(obj, maskj, key, 5.0, draw_bits=32))
    assert (fake != fake32).any()


def test_augment_batch_draw_bits16(rng):
    """float16 normals stay masked, keyed-deterministic, and within the
    ~3.3-sigma truncation of the 16-bit inverse CDF."""
    ob = rng.randn(2, 6, 10).astype(np.float32)
    ts = (6 * rng.rand(2, 6, 10)).astype(np.float32)
    mask = (rng.rand(2, 6, 10) < 0.5).astype(np.float32)
    obj, tsj, maskj = jnp.asarray(ob), jnp.asarray(ts), jnp.asarray(mask)
    key = jax.random.PRNGKey(0)
    ob2, ts2 = augment_batch(obj, tsj, maskj, key, 0.1, draw_bits=16)
    ob2, ts2 = np.asarray(ob2), np.asarray(ts2)
    assert (ob2[mask == 0] == 0).all() and (ts2[mask == 0] == 0).all()
    assert np.abs(ob2[mask == 1] - ob[mask == 1]).max() < 0.1 * 3.5
    assert np.abs(ts2[mask == 1] - ts[mask == 1]).max() < 0.01 * 3.5
    ob3, ts3 = augment_batch(obj, tsj, maskj, key, 0.1, draw_bits=16)
    np.testing.assert_array_equal(ob2, np.asarray(ob3))


def test_augment_batch_masked(rng):
    ob = rng.randn(2, 6, 10).astype(np.float32)
    ts = (6 * rng.rand(2, 6, 10)).astype(np.float32)
    mask = (rng.rand(2, 6, 10) < 0.5).astype(np.float32)
    ob2, ts2 = augment_batch(
        jnp.asarray(ob), jnp.asarray(ts), jnp.asarray(mask), jax.random.PRNGKey(0), 0.1
    )
    ob2, ts2 = np.asarray(ob2), np.asarray(ts2)
    assert (ob2[mask == 0] == 0).all() and (ts2[mask == 0] == 0).all()
    assert np.abs(ob2[mask == 1] - ob[mask == 1]).max() < 1.0
    assert np.abs(ts2[mask == 1] - ts[mask == 1]).max() < 0.1


def test_extract_abnormal_vitals(rng):
    eids = ["a", "b"]
    enc = pd.DataFrame({"encounter_deiden_id": eids})
    frames = {}
    for v in USE_FEATURES:
        frames[v] = pd.DataFrame(
            {
                "encounter_deiden_id": ["a", "a", "a", "b"],
                "time_stamp": [5.5, 6.2, 6.8, 3.0],  # only 6.2/6.8 in window for a
                "measurement": [100.0, 80.0, 120.0, 90.0],
            }
        )
    out = extract_abnormal_vitals(frames, enc, hours_from_admission=6)
    lo, hi = MIN_MAX_VALUES["sbp"]
    assert abs(out.loc[0, "sbp"] - (80.0 - lo) / (hi - lo)) < 1e-6  # min
    lo, hi = MIN_MAX_VALUES["heartRate"]
    assert abs(out.loc[0, "heartRate"] - (120.0 - lo) / (hi - lo)) < 1e-6  # max
    assert np.isnan(out.loc[1, "sbp"])  # encounter b has no window obs


def test_make_fake_ob_exact_k_under_ties(rng):
    """Random key bits can collide; the position bits packed into the
    selection keys must still yield EXACTLY max(1, floor(0.5*n_valid))
    slots. Forced here with ALL-EQUAL random bits (total collision) —
    position order then selects the first k valid slots."""
    from unittest import mock

    B, C, T = 16, 6, 40
    mask = np.zeros((B, C, T), np.float32)
    counts = rng.randint(1, T + 1, size=(B, C))
    for i in range(B):
        for j in range(C):
            mask[i, j, : counts[i, j]] = 1.0
    ob = rng.randn(B, C, T).astype(np.float32) * mask

    def constant_bits(key, shape, dtype=jnp.uint32):
        return jnp.full(shape, 0xDEADBEEF, dtype)

    with mock.patch.object(jax.random, "bits", constant_bits):
        fake = np.asarray(
            make_fake_ob(jnp.asarray(ob), jnp.asarray(mask), jax.random.PRNGKey(3), 5.0)
        )
    changed = fake != ob
    want = np.maximum(1, (0.5 * counts).astype(int))
    np.testing.assert_array_equal(changed.sum(axis=2), want)
    # with fully tied random bits the selection is the first k valid slots
    for i in range(B):
        for j in range(C):
            assert changed[i, j, : want[i, j]].all()


def test_fake_select_pallas_matches_xla(rng):
    """The TPU radix-select kernel and the sort-based XLA fallback must
    produce the IDENTICAL mask (pure int32 arithmetic, unique keys) — this
    is what lets the kernel be the default without a parity flag. The
    Pallas side runs in interpreter mode off-TPU."""
    from deep_interpolation_clustering_tpu.ops import pallas_select as ps

    B, C, T = 4, 6, 37
    counts = rng.randint(0, T + 1, size=(B, C)).astype(np.int32)
    k = np.where(counts > 0, np.maximum(1, counts // 2), 0).astype(np.int32)
    bits = rng.randint(0, 2**32, size=(B, C, T), dtype=np.uint64).astype(np.uint32)

    rows = B * C
    sel_xla = ps._select_xla(
        jnp.asarray(bits).reshape(rows, T),
        jnp.asarray(counts).reshape(rows, 1),
        jnp.asarray(k).reshape(rows, 1),
    )
    import functools
    from unittest import mock

    with mock.patch.object(
        ps.pl, "pallas_call", functools.partial(ps.pl.pallas_call, interpret=True)
    ):
        sel_pl = ps._select_pallas(
            jnp.asarray(bits).reshape(rows, T),
            jnp.asarray(counts).reshape(rows, 1),
            jnp.asarray(k).reshape(rows, 1),
        )
    np.testing.assert_array_equal(np.asarray(sel_xla), np.asarray(sel_pl))
    # exact-k, and only within the valid prefix
    sel = np.asarray(sel_xla).reshape(B, C, T)
    np.testing.assert_array_equal(sel.sum(axis=2), k)
    pos = np.arange(T)
    assert (sel <= (pos < counts[..., None])).all()


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """init_run's cache hook points jax at cfg.compilation_cache_dir, but
    never overrides a user-configured cache (env var or jax.config)."""
    import os

    import jax

    from deep_interpolation_clustering_tpu.cli.common import enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        cache = str(tmp_path / "xla")
        enable_compilation_cache(Config(compilation_cache_dir=cache))
        assert jax.config.jax_compilation_cache_dir == cache
        assert os.path.isdir(cache)

        # user's env var wins
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/elsewhere")
        enable_compilation_cache(Config(compilation_cache_dir=cache))
        assert jax.config.jax_compilation_cache_dir is None

        # empty string disables
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
        enable_compilation_cache(Config(compilation_cache_dir=""))
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_fake_select_partitioned_on_mesh(rng):
    """The custom_partitioning wrapper (used on TPU so the Mosaic kernel
    shards row-wise instead of being replicated by SPMD) must match the
    unsharded result when its rows are sharded across the 8-device mesh.
    On CPU the local function is the XLA fallback, so this exercises the
    partition/infer callbacks with the same machinery a TPU mesh uses."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deep_interpolation_clustering_tpu.ops import pallas_select as ps
    from deep_interpolation_clustering_tpu.parallel import make_mesh

    rows, T = 64, 37  # rows divisible by the 8-device mesh
    counts = rng.randint(0, T + 1, size=(rows, 1)).astype(np.int32)
    k = np.where(counts > 0, np.maximum(1, counts // 2), 0).astype(np.int32)
    bits = rng.randint(0, 2**32, size=(rows, T), dtype=np.uint64).astype(np.uint32)

    want = np.asarray(ps._select_xla(jnp.asarray(bits), jnp.asarray(counts), jnp.asarray(k)))

    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P("data", None))
    args = [
        jax.device_put(jnp.asarray(v), shard) for v in (bits, counts, k)
    ]
    got = jax.jit(ps._select_partitioned)(*args)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_config_validates_enum_fields():
    """Typo'd enum flags fail at construction with the valid options, not
    as deep trace errors (rng_draw_bits=8 would otherwise silently act
    as 32)."""
    import pytest

    from deep_interpolation_clustering_tpu import Config

    for kw in (
        {"matmul_precision": "hgih"},
        {"prng_impl": "philox"},
        {"rng_draw_bits": 8},
        {"optimizer": "adamw"},
        {"lr_decay_mode": "cosine"},
        {"dbscan_impl": "gpu"},
        {"eval_interval": 0},
        {"epoch_scan_unroll": -1},
    ):
        with pytest.raises(ValueError, match=next(iter(kw))):
            Config(**kw)
    # the documented values all construct (and replace() re-validates)
    cfg = Config(matmul_precision="default", prng_impl="rbg", rng_draw_bits=16)
    with pytest.raises(ValueError, match="rng_draw_bits"):
        cfg.replace(rng_draw_bits=8)
    # the Pallas-forward path carries its own XLA-replay VJP, so combining
    # it with the fused backward would silently never run the latter
    with pytest.raises(ValueError, match="mutually exclusive"):
        Config(use_pallas=True, use_pallas_bwd=True)


def test_config_roundtrip_drops_runtime_topology(tmp_path):
    """A multi-host rank's config.json must NOT carry its process rank or
    coordinator address: `--config` reloading them would make a later
    single-process run block in jax.distributed.initialize waiting on
    peers that never start."""
    import json

    from deep_interpolation_clustering_tpu import Config

    cfg = Config(
        num_processes=2, process_id=1,
        coordinator_address="127.0.0.1:1234", batch_size=64,
    )
    path = cfg.save(str(tmp_path))
    with open(path) as f:
        stored = json.load(f)
    for k in ("num_processes", "process_id", "coordinator_address"):
        assert k not in stored
    # a config saved BEFORE the exclusion (topology fields present) must
    # also reload clean
    stored["num_processes"] = 2
    stored["process_id"] = 1
    stored["coordinator_address"] = "127.0.0.1:1234"
    legacy = tmp_path / "legacy.json"
    legacy.write_text(json.dumps(stored))
    loaded = Config.load(str(legacy))
    assert loaded.num_processes == 0 and loaded.process_id == -1
    assert loaded.coordinator_address == ""
    assert loaded.batch_size == 64


def test_config_perf_profiles(tmp_path, caplog, monkeypatch):
    """`--perf_profile` pins the measured knob bundles (PARITY.md frontier):
    one flag instead of three hand-assembled ones, with the contract
    trade-offs logged and explicit conflicting flags warned about."""
    import logging

    import pytest

    from deep_interpolation_clustering_tpu import Config

    # the package logger doesn't propagate (own stream handler); caplog
    # captures via the root logger, so re-enable propagation for the test
    monkeypatch.setattr(logging.getLogger("dicl"), "propagate", True)

    assert Config().perf_profile == ""  # default: no preset, knobs apply
    c = Config(perf_profile="parity")
    assert (c.epoch_scan_unroll, c.prng_impl, c.matmul_precision) == (
        1, "threefry2x32", "high")
    c = Config(perf_profile="tuned")
    assert (c.epoch_scan_unroll, c.prng_impl, c.matmul_precision) == (
        4, "rbg", "high")
    c = Config(perf_profile="peak")
    assert (c.epoch_scan_unroll, c.prng_impl, c.matmul_precision) == (
        4, "rbg", "default")
    assert c.eval_matmul_precision == "default"  # peak stomps eval too
    assert Config(perf_profile="parity").eval_matmul_precision == "highest"
    assert Config(perf_profile="tuned").eval_matmul_precision == "highest"
    with pytest.raises(ValueError, match="perf_profile"):
        Config(perf_profile="fastest")
    # a conflicting explicit knob loses to the profile, with a warning
    with caplog.at_level(logging.WARNING, logger="dicl"):
        c = Config(perf_profile="peak", matmul_precision="highest")
    assert c.matmul_precision == "default"
    assert any("overrode" in r.message for r in caplog.records)
    # profile configs survive a save/load round trip unchanged
    path = Config(perf_profile="tuned").save(str(tmp_path))
    loaded = Config.load(path)
    assert loaded.perf_profile == "tuned" and loaded.epoch_scan_unroll == 4


def test_config_load_warns_on_shape_bearing_overrides(tmp_path, caplog, monkeypatch):
    """Reloading a run's config while overriding a checkpoint-shape field
    warns (the reference's load_config forbids such overrides outright via
    its changeable whitelist, utils.py:44-57)."""
    import logging

    from deep_interpolation_clustering_tpu import Config

    monkeypatch.setattr(logging.getLogger("dicl"), "propagate", True)

    path = Config(num_timestamps=354, lstm_hidden=128).save(str(tmp_path))
    with caplog.at_level(logging.WARNING, logger="dicl"):
        c = Config.load(path, num_timestamps=48, lstm_hidden=64)
    assert c.num_timestamps == 48 and c.lstm_hidden == 64  # override wins
    msgs = [r.message for r in caplog.records]
    assert any("num_timestamps" in m and "lstm_hidden" in m for m in msgs)
    # non-shape overrides and unchanged shape values stay silent
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="dicl"):
        Config.load(path, batch_size=64, num_timestamps=354)
    assert not [r for r in caplog.records if "shape-bearing" in r.message]


def test_fake_select_packed_matches_xla(rng):
    """The lane-packed short-T kernel (`_select_pallas_packed`) must
    produce the identical mask as the sort oracle for every pack factor,
    including rows not divisible by the factor and T values that leave
    lane padding (interpret mode off-TPU; on-chip exactness is asserted by
    benchmarks/radix_ab.py)."""
    import functools
    from unittest import mock

    from deep_interpolation_clustering_tpu.ops import pallas_select as ps

    for rows, t in [(48, 48), (37, 37), (23, 100), (96, 16), (7, 192)]:
        g = ps._pack_factor(t)
        assert g >= 2, (rows, t)
        bits = jnp.asarray(
            rng.randint(0, 2**32, size=(rows, t), dtype=np.uint64).astype(np.uint32)
        )
        nv = rng.randint(0, t + 1, size=(rows,)).astype(np.int32)
        k = np.where(nv > 0, np.maximum(1, nv // 2), 0).astype(np.int32)
        nv2 = jnp.asarray(nv)[:, None]
        k2 = jnp.asarray(k)[:, None]
        ref = np.asarray(ps._select_xla(bits, nv2, k2))
        with mock.patch.object(
            ps.pl, "pallas_call", functools.partial(ps.pl.pallas_call, interpret=True)
        ):
            got = np.asarray(ps._select_pallas_packed(bits, nv2, k2, g))
        np.testing.assert_array_equal(got, ref, err_msg=f"rows={rows} t={t} g={g}")


def test_fake_select_unpacked_t200_matches_xla(rng):
    """Unpacked kernel at a mid-size T (pack factor 1, 2-lane-tile pad):
    interpret-mode exactness vs the sort oracle."""
    import functools
    from unittest import mock

    from deep_interpolation_clustering_tpu.ops import pallas_select as ps

    rows, t = 19, 200
    assert ps._pack_factor(t) == 1
    bits = jnp.asarray(
        rng.randint(0, 2**32, size=(rows, t), dtype=np.uint64).astype(np.uint32)
    )
    nv = rng.randint(0, t + 1, size=(rows,)).astype(np.int32)
    k = np.where(nv > 0, np.maximum(1, nv // 2), 0).astype(np.int32)
    nv2 = jnp.asarray(nv)[:, None]
    k2 = jnp.asarray(k)[:, None]
    ref = np.asarray(ps._select_xla(bits, nv2, k2))
    with mock.patch.object(
        ps.pl, "pallas_call", functools.partial(ps.pl.pallas_call, interpret=True)
    ):
        got = np.asarray(ps._select_pallas(bits, nv2, k2))
    np.testing.assert_array_equal(got, ref)
