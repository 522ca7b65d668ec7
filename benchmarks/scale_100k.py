"""Scaled-config benchmark (BASELINE.json configs[4]): 100k-encounter
cohort — full pretrain epochs through the real trainer (streaming host
batches, data-parallel when >1 device) plus the on-device gap statistic
over the latents.

Prints one JSON line per phase.

`--max_obs 354 --batch_size 256` measures the PRODUCTION sequence shape
at the 100k scale: the four (100k, 6, 354) f32 planes are ~3.4 GB —
device-resident in HBM like every cohort here, proving the fused-epoch
design holds when the data is production-sized in BOTH axes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from _harness import cached_synthetic_cohorts  # noqa: E402

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.cluster import KSelection
from deep_interpolation_clustering_tpu.data import ArrayDataset
from deep_interpolation_clustering_tpu.parallel import make_mesh
from deep_interpolation_clustering_tpu.train import Trainer

N = 100_000
MAX_OBS = 48


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=N)
    ap.add_argument("--max_obs", type=int, default=MAX_OBS)
    # B=4096 measured best at the T=48 default (1024: ~127k, 4096: ~199k,
    # 8192: ~184k enc/s): tiny-T steps are per-op-overhead-bound, so fewer,
    # larger steps win until HBM working-set pressure pushes back. At
    # T=354 the frontier reverses (PARITY.md): pass --batch_size 256 there.
    ap.add_argument("--batch_size", type=int, default=4096)
    ap.add_argument("--skip_analytics", action="store_true",
                    help="epoch timing only (skip latents + gap statistic)")
    args = ap.parse_args()

    # synthetic p0, /tmp-cached across benchmark reruns (shared helper —
    # one copy of the cache format between scale_p3p4 and this script; the
    # T=354 variant costs 125-205 s of single-core host work uncached)
    cohorts, p0_s, cached = cached_synthetic_cohorts(args.n, args.max_obs)
    rec = {"metric": "p0_100k_seconds", "value": round(p0_s, 1)}
    if cached:
        rec["cached"] = True
    print(json.dumps(rec))

    # epoch_scan_unroll=4: +7% on the fused T=48 epoch (benchmarks/
    # unroll_sweep.py, r3) — this analytics bench carries no fused==stepped
    # bit-identity contract, so the drift trade is free here.
    cfg = Config(
        batch_size=args.batch_size, num_timestamps=args.max_obs, max_epochs=3,
        log_train_freq=10_000, log_valid_freq=10_000, early_stopping=10_000,
        epoch_scan_unroll=4,
    )
    datasets = {c: ArrayDataset(cfg, d, c) for c, d in cohorts.items()}
    n_dev = len(jax.devices())
    mesh = (
        make_mesh(n_dev) if n_dev > 1 and cfg.batch_size % n_dev == 0 else None
    )
    tr = Trainer(cfg, datasets, "/tmp/scale100k_run", mesh=mesh,
                 use_tensorboard=False)

    # warmup epoch (compiles), then timed epochs
    tr.train_one_epoch(datasets["training"], denoise=False)
    t0 = time.time()
    n_epochs = 2
    for _ in range(n_epochs):
        tr.epoch += 1
        tr.train_one_epoch(datasets["training"], denoise=False)
    dt = (time.time() - t0) / n_epochs
    n_train = len(datasets["training"])
    print(json.dumps({
        "metric": "pretrain_epoch_seconds_100k", "value": round(dt, 2),
        "encounters_per_sec": round(n_train / dt, 1),
    }))

    # eval_interval mechanics in isolation: dispatch a window of fused
    # epochs back-to-back, fetch all losses once (what Config.eval_interval
    # does between eval boundaries). The per-epoch timing above pays one
    # tunnel device_get round trip per epoch; this pays 1/k of it.
    ds_train = datasets["training"]
    nb = ds_train.num_batches(cfg.batch_size)
    t0 = time.time()
    k_window = 4
    pend = []
    for _ in range(k_window):
        tr.epoch += 1
        handles = tr._dispatch_fused_epoch(
            ds_train, False, tr._epoch_key(tr.epoch),
            np.random.RandomState(cfg.seed + tr.epoch),
        )
        pend.append((tr.epoch, handles, nb))
    for e, handles, n_b in pend:
        tr._finalize_fused_epoch(e, handles, n_b)
    dt_def = (time.time() - t0) / k_window
    print(json.dumps({
        "metric": "pretrain_epoch_seconds_100k_deferred", "value": round(dt_def, 2),
        "encounters_per_sec": round(n_train / dt_def, 1),
        "window_epochs": k_window,
    }))

    if args.skip_analytics:
        return

    # latents for the full training cohort, then on-device gap statistic.
    # dump_keys skips the D2H of unneeded rec_ob; a warm pass excludes the
    # one-time jit compile so the metric matches the warmed pretrain phase
    tr.eval_one_epoch("train", datasets["training"], denoise=False,
                      dump_keys=("hidden",))  # same cohort: scan length is
    # part of the compiled shape, so only this warms the right program
    t0 = time.time()
    metrics, dumps = tr.eval_one_epoch(
        "train", datasets["training"], denoise=False, dump_keys=("hidden",)
    )
    hidden = np.concatenate(dumps["hidden"], axis=0)
    print(json.dumps({
        "metric": "latent_extract_seconds_100k", "value": round(time.time() - t0, 2),
        "shape": list(hidden.shape),
    }))

    # device-resident extract (device_dumps=True): same program, no outputs
    # D2H — the path the DEC center init rides (the delta vs the host fetch
    # above is pure tunnel time)
    t0 = time.time()
    _, ddumps = tr.eval_one_epoch(
        "train", datasets["training"], denoise=False, dump_keys=("hidden",),
        device_dumps=True,
    )
    dev_hidden = jax.block_until_ready(ddumps["hidden"][0])
    dt = time.time() - t0
    assert np.array_equal(np.asarray(dev_hidden[:64]), hidden[:64])
    print(json.dumps({
        "metric": "latent_extract_seconds_100k_device",
        "value": round(dt, 2),
    }))

    t0 = time.time()
    sel = KSelection(cfg.replace(k_max=8, n_init=3, gap_b=3), "/tmp/scale100k_run/optk")
    gap = sel.gap_statistic(hidden, version=1, plot=False)
    print(json.dumps({
        "metric": "gap_statistic_seconds_100k_k2-8", "value": round(time.time() - t0, 1),
        # Tibshirani rule may not fire on under-trained latents; the argmax
        # fallback still reports a usable K
        "opt_k": gap["opt_k"] if gap["opt_k"] is not None else gap["opt_k_argmax"],
    }))


if __name__ == "__main__":
    main()
