"""Sweep `Config.epoch_scan_unroll` for the fused train epoch (VERDICT r2
#7): unrolling k steps per scan iteration lets XLA co-schedule the
data-only ops of step i+1 (gather, fake select, augment) with step i's
compute — the production T=354 step is latency-bound and the scaled T=48
step is per-op-overhead-bound, so both might benefit.

Run: `python benchmarks/unroll_sweep.py [--shapes prod,scaled]`
Prints one JSON line per (shape, unroll) point.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def make_batch(rng, b, c, t, hours):
    counts = rng.randint(max(2, t // 3), t + 1, size=(b, c))
    mask = (np.arange(t)[None, None, :] < counts[:, :, None]).astype(np.float32)
    ob = (rng.rand(b, c, t).astype(np.float32) * 5.0 - 2.5) * mask
    ts = np.sort(rng.rand(b, c, t).astype(np.float32) * hours, axis=-1) * mask
    ae = mask * (rng.rand(b, c, t) > 0.2).astype(np.float32)
    fv = rng.rand(b, c).astype(np.float32)
    fvm = (rng.rand(b, c) < 0.9).astype(np.float32)
    return ob, mask, ts, ae, fv, fvm


def time_epoch(cfg, n_batches=20, epochs=8):
    """min sec/step of the real fused `make_train_epoch` program (same
    two-length slope sync methodology as bench.py — see its comment on the
    tunneled backend)."""
    import jax
    import jax.numpy as jnp

    from deep_interpolation_clustering_tpu.models import init_net
    from deep_interpolation_clustering_tpu.train import make_optimizer
    from deep_interpolation_clustering_tpu.train.steps import make_train_epoch

    B, T = cfg.batch_size, cfg.num_timestamps
    n = B * n_batches
    rng = np.random.RandomState(0)
    ob, mask, ts, ae, fv, fvm = make_batch(
        rng, n, cfg.num_variables, T, cfg.hours_from_admission
    )
    data = {
        "ob": jnp.asarray(ob), "padding_mask": jnp.asarray(mask),
        "timestamp": jnp.asarray(ts), "ae_mask": jnp.asarray(ae),
        "future_vital": jnp.asarray(fv), "future_vital_mask": jnp.asarray(fvm),
    }
    params, state = init_net(jax.random.PRNGKey(1), cfg)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    epoch_fn = make_train_epoch(cfg, optimizer, denoise=False)
    idx = jnp.arange(n).reshape(n_batches, B)
    key = jax.random.PRNGKey(2)

    def run(ncalls, base):
        nonlocal params, state, opt_state
        t0 = time.perf_counter()
        losses = None
        for i in range(ncalls):
            params, state, opt_state, losses = epoch_fn(
                params, state, opt_state, data, idx,
                jax.random.fold_in(key, base + i),
            )
        float(jax.device_get(losses["loss"][-1]))  # hard sync
        return time.perf_counter() - t0

    run(2, 0)  # compile + warm
    t_short = run(2, 100)
    t_long = run(epochs + 2, 200)
    return (t_long - t_short) / epochs / n_batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="prod,scaled")
    ap.add_argument("--unrolls", default="1,2,4")
    args = ap.parse_args()

    from deep_interpolation_clustering_tpu import Config

    shapes = {
        "prod": dict(batch_size=256, num_timestamps=354),
        "scaled": dict(batch_size=4096, num_timestamps=48),
    }
    for name in args.shapes.split(","):
        for unroll in (int(u) for u in args.unrolls.split(",")):
            cfg = Config(**shapes[name], epoch_scan_unroll=unroll)
            # scaled shape: fewer batches keep the cohort upload sane
            nb = 20 if name == "prod" else 8
            sec = time_epoch(cfg, n_batches=nb)
            print(json.dumps({
                "shape": name, "unroll": unroll,
                "us_per_step": round(1e6 * sec, 1),
                "enc_per_sec": round(cfg.batch_size / sec),
            }), flush=True)


if __name__ == "__main__":
    main()
