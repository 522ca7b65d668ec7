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

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from _harness import make_batch, time_epoch  # noqa: E402, F401  (re-exported)


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
