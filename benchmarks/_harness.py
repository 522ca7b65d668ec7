"""Shared fused-epoch timing harness for the benchmark scripts.

One copy of the synthetic-batch builder and the two-length slope timing
(unroll_sweep, drawbits_ab, profile_step all need it; three drifting
copies is how the sync caveat gets fixed in one and not the others).
bench.py keeps its own self-contained versions — it is the driver's
recorded artifact and must run standalone.

Sync methodology (same as bench.py): on the tunneled TPU backend,
block_until_ready can return before remote execution finishes; only a
device_get truly synchronizes. Timing two run lengths and taking the
slope cancels the constant dispatch/sync overhead.
"""

from __future__ import annotations

import time

import numpy as np


def make_batch(rng, b, c, t, hours):
    counts = rng.randint(max(2, t // 3), t + 1, size=(b, c))
    mask = (np.arange(t)[None, None, :] < counts[:, :, None]).astype(np.float32)
    ob = (rng.rand(b, c, t).astype(np.float32) * 5.0 - 2.5) * mask
    ts = np.sort(rng.rand(b, c, t).astype(np.float32) * hours, axis=-1) * mask
    ae = mask * (rng.rand(b, c, t) > 0.2).astype(np.float32)
    fv = rng.rand(b, c).astype(np.float32)
    fvm = (rng.rand(b, c) < 0.9).astype(np.float32)
    return ob, mask, ts, ae, fv, fvm


def build_epoch_state(cfg, n_batches=20, seed=0):
    """(epoch_fn, carry, data, idx, key) for the real fused train epoch over
    an HBM-resident synthetic cohort at cfg's shapes — the path bench_ours
    times. The key's impl rides cfg.prng_impl."""
    import jax
    import jax.numpy as jnp

    from deep_interpolation_clustering_tpu.models import init_net
    from deep_interpolation_clustering_tpu.train import make_optimizer
    from deep_interpolation_clustering_tpu.train.steps import make_train_epoch

    b, t = cfg.batch_size, cfg.num_timestamps
    n = b * n_batches
    rng = np.random.RandomState(seed)
    ob, mask, ts, ae, fv, fvm = make_batch(
        rng, n, cfg.num_variables, t, cfg.hours_from_admission
    )
    data = {
        "ob": jnp.asarray(ob), "padding_mask": jnp.asarray(mask),
        "timestamp": jnp.asarray(ts), "ae_mask": jnp.asarray(ae),
    }
    if cfg.aux_tasks:
        data["future_vital"] = jnp.asarray(fv)
        data["future_vital_mask"] = jnp.asarray(fvm)
    params, state = init_net(jax.random.key(1, impl=cfg.prng_impl), cfg)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    epoch_fn = make_train_epoch(cfg, optimizer, denoise=False)
    idx = jnp.asarray(np.arange(n, dtype=np.int32).reshape(n_batches, b))
    key = jax.random.key(2, impl=cfg.prng_impl)
    return epoch_fn, [params, state, opt_state], data, idx, key


def make_runner(cfg, n_batches=20, seed=0):
    """`run(ncalls, base) -> wall seconds` over the fused epoch, ending in a
    hard device_get sync; state threads across calls so arms stay warm."""
    import jax

    epoch_fn, carry, data, idx, key = build_epoch_state(cfg, n_batches, seed)

    def run(ncalls, base):
        t0 = time.perf_counter()
        losses = None
        for i in range(ncalls):
            carry[0], carry[1], carry[2], losses = epoch_fn(
                carry[0], carry[1], carry[2], data, idx,
                jax.random.fold_in(key, base + i),
            )
        float(jax.device_get(losses["loss"][-1]))  # hard sync
        return time.perf_counter() - t0

    return run


def time_epoch(cfg, n_batches=20, epochs=8):
    """sec/step of the real fused `make_train_epoch` program (min over one
    warmed two-length slope)."""
    run = make_runner(cfg, n_batches)
    run(2, 0)  # compile + warm
    t_short = run(2, 100)
    t_long = run(epochs + 2, 200)
    return (t_long - t_short) / epochs / n_batches


def cached_synthetic_cohorts(n, max_obs):
    """Processed synthetic cohorts for the scale benchmarks, cached in /tmp.

    The synthetic p0 is deterministic in (n, max_obs) with the generator
    defaults pinned here (seed 0, default phenotypes) and costs minutes of
    single-core host work at scale (125-205 s at 100k/T=354). One copy so
    scale_100k and scale_p3p4 can't drift apart or read each other's stale
    caches after a generator change — bump _COHORT_CACHE_V on any change to
    the generator or to process_splits.

    Returns (cohorts, seconds_spent, was_cached).
    """
    import time as _time

    from deep_interpolation_clustering_tpu.data.synthetic import (
        make_synthetic_cohorts,
    )
    from deep_interpolation_clustering_tpu.data.preprocess import process_splits

    _COHORT_CACHE_V = 1
    cache = f"/tmp/scale_cohorts_v{_COHORT_CACHE_V}_{n}_{max_obs}.npz"
    t0 = _time.time()
    import os

    if os.path.exists(cache):
        with np.load(cache, allow_pickle=True) as z:
            cohorts = {k: z[k].item() for k in z.files}
        return cohorts, _time.time() - t0, True
    cohorts = process_splits(
        make_synthetic_cohorts(n_total=n, max_obs=max_obs),
        rng=np.random.RandomState(0),
    )
    np.savez(cache, **{k: np.array(v, dtype=object) for k, v in cohorts.items()})
    return cohorts, _time.time() - t0, False
