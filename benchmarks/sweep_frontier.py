"""Throughput frontier at the production shape (T=354): B x matmul-precision.

VERDICT r2 weak #1: the headline bench pins B=256 (the parity default)
while HBM utilization sits at ~14% — the step is latency-bound and batch
amortizes it (benchmarks/scale_100k.py showed ~127k -> ~199k enc/s going
B=1024 -> 4096 at T=48), but nobody had measured the production T=354
shape. This sweep runs the SAME fused-epoch production path as bench.py
at B in {256..4096} x matmul_precision in {highest, high, default} on the
real chip and prints a markdown table (for PARITY.md) plus one JSON line
per point. The winning config feeds bench.py's `peak_throughput` field.
(r3 addendum: "high" was added after the first sweep once it measured
parity-identical to "highest" at +26% throughput — see PARITY.md.)

Run: `python benchmarks/sweep_frontier.py [--quick]`
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import bench  # noqa: E402  (repo-root bench.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="B in {256, 1024, 4096} only")
    ap.add_argument("--batches", type=int, nargs="+", default=None)
    args = ap.parse_args()
    batches = args.batches or ([256, 1024, 4096] if args.quick
                               else [256, 512, 1024, 2048, 4096])

    rows = []
    for precision in ("highest", "high", "default"):
        for b in batches:
            enc_s, cost = bench.bench_ours(batch=b, matmul_precision=precision)
            roof = bench._roofline(cost)
            row = {
                "batch": b,
                "matmul_precision": precision,
                "enc_per_sec": round(enc_s, 1),
                "ms_per_step": round(1e3 * cost["sec_per_step"], 3),
                "mfu_pct": roof.get("mfu_pct"),
                "hbm_bw_util_pct": roof.get("hbm_bw_util_pct"),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    best = max(rows, key=lambda r: r["enc_per_sec"])
    print("\n| B | precision | enc/s | ms/step | MFU % | HBM BW % |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        mark = " **<- peak**" if r is best else ""
        print(
            f"| {r['batch']} | {r['matmul_precision']} | {r['enc_per_sec']:,.0f} "
            f"| {r['ms_per_step']} | {r['mfu_pct']} | {r['hbm_bw_util_pct']} |{mark}"
        )
    print(f"\npeak: {json.dumps(best)}")


if __name__ == "__main__":
    main()
