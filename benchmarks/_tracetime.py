"""Trace-based device timing for step-level A/Bs.

The axon tunnel adds +-40-60 us of host-side noise per epoch dispatch, so
wall-clock A/Bs cannot resolve <10% step effects without many interleaved
repetitions. The device timeline has no such noise: this helper runs N
epochs of the production fused scan under a jax.profiler trace and returns
the per-step device duration of the epoch while-loop — the schedule's own
length, independent of host/tunnel state.

Caveats (measured, PARITY.md r3): per-op self-times double-count against
the epoch-op total (nesting); and the epoch-op span under-credits
epoch_scan_unroll's cross-step overlap — device totals read
unroll-neutral while sustained wall slopes (benchmarks/_harness
time_epoch) show +14%. Use this tool to RANK hotspots within one config;
use wall slopes for cross-config verdicts.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import tempfile

import numpy as np


def _device_events(trace_dir):
    f = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    events = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    return [
        e
        for e in events
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e.get("pid"), "")
    ]


def time_epoch_device(cfg, n_batches=20, epochs=3, keep_trace=None):
    """Device us/step of the production fused train epoch under `cfg`.

    Returns (us_per_step, op_table) where op_table maps op name ->
    (us_per_step, count) for steady-state per-step ops.
    """
    import jax
    import jax.numpy as jnp

    import bench
    from deep_interpolation_clustering_tpu.models import init_net
    from deep_interpolation_clustering_tpu.train import make_optimizer
    from deep_interpolation_clustering_tpu.train.steps import make_train_epoch

    B = cfg.batch_size
    n = B * n_batches
    rng = np.random.RandomState(0)
    ob, mask, ts, ae, fv, fvm = bench.make_batch(rng, n)
    data = {
        "ob": jnp.asarray(ob),
        "padding_mask": jnp.asarray(mask),
        "timestamp": jnp.asarray(ts),
        "ae_mask": jnp.asarray(ae),
        "future_vital": jnp.asarray(fv),
        "future_vital_mask": jnp.asarray(fvm),
    }
    params, state = init_net(jax.random.PRNGKey(1), cfg)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    epoch_fn = make_train_epoch(cfg, opt, denoise=False)
    idx = jnp.arange(n).reshape(n_batches, B)
    key = jax.random.key(2, impl=cfg.prng_impl)
    out = epoch_fn(params, state, opt_state, data, idx, key)
    jax.block_until_ready(out)

    tdir = keep_trace or tempfile.mkdtemp(prefix="dic_trace_")
    jax.profiler.start_trace(tdir)
    try:
        for i in range(epochs):
            out = epoch_fn(*(out[:3]), data, idx, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
    finally:
        jax.profiler.stop_trace()

    dev = _device_events(tdir)
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in dev:
        agg[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
    # the top-level jit op covers the WHOLE epoch — dividing the while-loop
    # op instead silently under-counts when scan unrolling leaves a
    # remainder block outside the loop (unroll=8 at 20 batches runs 16
    # steps inside the while and 4 outside; the while/20 read looked 19%
    # faster and was exactly unroll=4 parity once corrected)
    tops = [n2 for n2 in agg if cnt[n2] == epochs and n2.startswith("jit_")]
    if not tops:
        tops = [n2 for n2 in agg if n2.startswith("while")]
    wname = max(tops, key=lambda n2: agg[n2])
    us_step = agg[wname] / cnt[wname] / n_batches
    steps = epochs * n_batches
    table = {
        n2: (agg[n2] / steps, cnt[n2])
        for n2 in agg
        if cnt[n2] == steps
    }
    if keep_trace is None:
        shutil.rmtree(tdir, ignore_errors=True)
    return us_step, table
