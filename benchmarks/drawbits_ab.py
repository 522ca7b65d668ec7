"""Interleaved A/B: Config.rng_draw_bits 32 vs 16 for the fused train epoch.

The step's big (B, C, T) draws (augmentation normals x2, fake-select keys,
fake-noise uniforms) are ~92% of its ~3.3M threefry words; 16-bit draws
halve that work while keeping every threefry determinism guarantee (unlike
prng_impl="rbg"). Between-run tunnel noise is +-40 us, so A and B compile
up front and alternate within one session; report min over reps per arm
(same methodology as the unroll/prng 2x2 in PARITY.md).

Run: `python benchmarks/drawbits_ab.py [--unroll 1] [--prng threefry2x32]
      [--precision high] [--reps 4]`
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from _harness import make_runner  # noqa: E402  (shared slope harness)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--prng", default="threefry2x32")
    ap.add_argument("--precision", default="high")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=8)
    args = ap.parse_args()

    from deep_interpolation_clustering_tpu import Config

    n_batches = 20
    base = dict(
        batch_size=256, num_timestamps=354, epoch_scan_unroll=args.unroll,
        prng_impl=args.prng, matmul_precision=args.precision,
    )
    arms = {
        "bits32": make_runner(Config(**base, rng_draw_bits=32), n_batches),
        "bits16": make_runner(Config(**base, rng_draw_bits=16), n_batches),
    }
    for name, run in arms.items():
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
            "arm": name, "unroll": args.unroll, "prng": args.prng,
            "us_per_step": round(1e6 * sec, 1),
            "enc_per_sec": round(256 / sec),
        }), flush=True)


if __name__ == "__main__":
    main()
