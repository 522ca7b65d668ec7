"""Interleaved A/B: Config.sci_share_weights on/off for the fused train epoch.

At the production default (aug_input=False, fake_detection=True) the fake
stream shares (mask, ts) with the real stream, so SCI's ob-independent
logit/softmax grid chain — the transcendental-heavy (B, C, T, R) part — is
computed twice per step for identical inputs unless deduped
(ops/interpolation.sci_forward_multi). This measures the dedup's step cost
on the real chip: wall slopes (the cross-config verdict instrument) plus a
device-timeline read per arm.

Run: `python benchmarks/sci_dedup_ab.py [--reps 4] [--precision high]`
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from _harness import make_runner  # noqa: E402
from _tracetime import time_epoch_device  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="high")
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--prng", default="threefry2x32")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--trace", action="store_true",
                    help="also read the device timeline per arm")
    args = ap.parse_args()

    from deep_interpolation_clustering_tpu import Config

    n_batches = 20
    base = dict(
        batch_size=256, num_timestamps=354, epoch_scan_unroll=args.unroll,
        prng_impl=args.prng, matmul_precision=args.precision,
    )
    cfgs = {
        "shared": Config(**base, sci_share_weights=True),
        "per_stream": Config(**base, sci_share_weights=False),
    }
    arms = {name: make_runner(cfg, n_batches) for name, cfg in cfgs.items()}
    for run in arms.values():
        run(2, 0)  # compile + warm
    best = {name: float("inf") for name in arms}
    for rep in range(args.reps):
        for name, run in arms.items():
            t_short = run(2, 100 + 10 * rep)
            t_long = run(args.epochs + 2, 200 + 10 * rep)
            sec = (t_long - t_short) / args.epochs / n_batches
            best[name] = min(best[name], sec)
    for name, sec in best.items():
        print(json.dumps({
            "arm": name, "precision": args.precision,
            "us_per_step": round(1e6 * sec, 1),
            "enc_per_sec": round(256 / sec),
        }), flush=True)

    if args.trace:
        for name, cfg in cfgs.items():
            us, _ = time_epoch_device(cfg, n_batches=n_batches, epochs=3)
            print(json.dumps({"arm": name, "device_us_per_step": round(us, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
