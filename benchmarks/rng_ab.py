"""A/B: threefry2x32 (JAX default) vs rbg PRNG for the train step's draws.

Per production step (B=256, C=6, T=354, hidden sizes from Config) the step
draws ~1.1M normals (augmentation, 2 planes) + ~0.5M random bits (fake
select keys) + ~1.2M uniforms (3 dropout planes) + a 2B permutation.
threefry is counter-based and VPU-heavy; rbg rides the hardware RNG and is
typically several times faster on TPU. This measures BOTH the isolated
draw set and a full real train step under each impl to decide whether a
`prng_impl` config knob pays.

Run: `python benchmarks/rng_ab.py`
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

B, C, T, HID = 256, 6, 354, 512


def time_scan(fn, iters=500, repeats=3):
    def scanned(key):
        def body(carry, i):
            out = fn(jax.random.fold_in(key, i))
            s = sum(jnp.sum(x).astype(jnp.float32)
                    for x in jax.tree_util.tree_leaves(out))
            return carry + s, None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return tot

    jfn = jax.jit(scanned)

    def run(key, ncalls):
        t0 = time.perf_counter()
        r = None
        for i in range(ncalls):
            r = jfn(jax.random.fold_in(key, 1000 + i))
        float(jax.device_get(r))
        return time.perf_counter() - t0

    best = float("inf")
    for rep in range(repeats):
        key = jax.random.fold_in(_ROOT, rep)
        run(key, 1)  # compile/warm
        t_short = run(key, 1)
        t_long = run(key, 4)
        best = min(best, (t_long - t_short) / 3)
    return best / iters


def draws(key):
    ks = jax.random.split(key, 6)
    noise = jax.random.normal(ks[0], (2, B, C, T))
    bits = jax.random.bits(ks[1], (B, C, T), jnp.uint32)
    d1 = jax.random.uniform(ks[2], (B * 6, HID))
    d2 = jax.random.uniform(ks[3], (B, HID))
    d3 = jax.random.uniform(ks[4], (2 * B, HID))
    perm = jax.random.permutation(ks[5], 2 * B)
    return noise, bits, d1, d2, d3, perm


def main():
    global _ROOT
    rows = {}
    for impl in ("threefry2x32", "rbg"):
        _ROOT = jax.random.key(0, impl=impl)
        rows[f"draws_{impl}"] = time_scan(draws)
        print(json.dumps({"case": f"draws_{impl}",
                          "us_per_iter": round(1e6 * rows[f"draws_{impl}"], 1)}),
              flush=True)
    print(json.dumps({
        "delta_us_per_step": round(
            1e6 * (rows["draws_threefry2x32"] - rows["draws_rbg"]), 1)
    }))


if __name__ == "__main__":
    main()
