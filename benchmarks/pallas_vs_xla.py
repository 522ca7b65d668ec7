"""Pallas-vs-XLA kernel shootout on the real TPU (VERDICT round-1 item 10).

Times the fused Pallas SCI/RBF kernels against the plain-jnp XLA paths at
the p1 production shape (B=256, T=354 — reference p1_pretrain_main.py
defaults), the 100k scaled config (B=1024, T=48 — benchmarks/scale_100k.py),
and a large point (B=1024, T=354), forward and forward+backward. The
numbers decide `Config.use_pallas`'s default; record them in PARITY.md.

Prints one JSON line per (shape, op, direction).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deep_interpolation_clustering_tpu.ops.interpolation import sci_forward
from deep_interpolation_clustering_tpu.ops.pallas_interp import (
    rbf_project_pallas,
    sci_forward_pallas,
)
from deep_interpolation_clustering_tpu.ops.rbf import rbf_decode, rbf_init

C, R, HOURS = 6, 6, 6.0
SHAPES = [(256, 354), (1024, 48), (1024, 354)]


def make_raw(rng, b, t):
    """Stacked (B, 4C, T) raw input: [ob | mask | timestamp | ae_mask]."""
    mask = np.zeros((b, C, t), np.float32)
    counts = rng.randint(max(4, t // 3), t + 1, size=(b, C))
    for i in range(b):
        for j in range(C):
            mask[i, j, : counts[i, j]] = 1.0
    ob = (rng.rand(b, C, t).astype(np.float32) * 5 - 2.5) * mask
    ts = np.sort(rng.rand(b, C, t).astype(np.float32) * HOURS, axis=-1) * mask
    ae = mask
    return jnp.asarray(np.concatenate([ob, mask, ts, ae], axis=1))


def _scan_loop(fn, n, args):
    """Jit a lax.scan that applies `fn` n times with a real data
    dependence between iterations (the carry perturbs the first argument
    by ~1e-30, so XLA cannot hoist the loop-invariant computation), and
    returns a single scalar. Per-call Python dispatch over the axon
    tunnel costs O(100 us) — more than these kernels — so the only honest
    timing is N device-side iterations inside ONE dispatch."""

    @jax.jit
    def loop():
        def body(c, _):
            a0 = jax.tree_util.tree_map(lambda a: a + c.astype(a.dtype), args[0])
            out = fn(a0, *args[1:])
            # the carry must consume EVERY output leaf, or XLA dead-code-
            # eliminates whatever it doesn't feed (e.g. the grads under
            # value_and_grad, or most of the output array)
            tot = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))
            return tot.astype(jnp.float32) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    return loop


def time_fn(fn, *args, iters=400):
    """Two scan lengths; the slope cancels the dispatch + 4-byte-sync
    constant. Median of 3 slope samples."""
    n0, n1 = iters // 4, iters
    short = _scan_loop(fn, n0, args)
    long = _scan_loop(fn, n1, args)

    def run(loop):
        t0 = time.perf_counter()
        jax.device_get(loop())  # scalar out -> 4-byte hard sync
        return time.perf_counter() - t0

    run(short), run(long)  # compile + warm
    # min over repeats before taking the slope: tunnel sync jitter is
    # ms-scale and one-sided, so min is the robust location estimate
    t0 = min(run(short) for _ in range(5))
    t1 = min(run(long) for _ in range(5))
    return (t1 - t0) / (n1 - n0)


def bench_sci(b, t):
    rng = np.random.RandomState(0)
    x = make_raw(rng, b, t)
    kernel = jnp.zeros((C,), jnp.float32)

    xla_f = jax.jit(lambda k, xx: sci_forward(k, xx, R, HOURS))
    pls_f = jax.jit(lambda k, xx: sci_forward_pallas(k, xx, R, HOURS))
    # value_and_grad, NOT grad: with grad alone XLA dead-code-eliminates
    # the custom-vjp forward (its residuals are just (kernel, x)), so the
    # Pallas kernel would never run in the timed graph
    xla_g = jax.jit(jax.value_and_grad(
        lambda k, xx: jnp.sum(sci_forward(k, xx, R, HOURS)), (0, 1)))
    pls_g = jax.jit(jax.value_and_grad(
        lambda k, xx: jnp.sum(sci_forward_pallas(k, xx, R, HOURS)), (0, 1)))

    np.testing.assert_allclose(
        np.asarray(xla_f(kernel, x)), np.asarray(pls_f(kernel, x)), atol=5e-4
    )
    return {
        "xla_fwd_us": time_fn(xla_f, kernel, x) * 1e6,
        "pallas_fwd_us": time_fn(pls_f, kernel, x) * 1e6,
        "xla_fwdbwd_us": time_fn(xla_g, kernel, x) * 1e6,
        "pallas_fwdbwd_us": time_fn(pls_g, kernel, x) * 1e6,
    }


def bench_rbf(b, t):
    rng = np.random.RandomState(1)
    raw = make_raw(rng, b, t)
    interp = jnp.asarray(rng.rand(b, R, 256).astype(np.float32))
    params, state = rbf_init(jax.random.PRNGKey(0), 256, C)

    def full(params, interp, raw, use_pallas):
        y, _ = rbf_decode(params, state, interp, raw, R, HOURS, 0.0, False,
                          use_pallas=use_pallas)
        return y

    xla_f = jax.jit(lambda p, i, r: full(p, i, r, False))
    pls_f = jax.jit(lambda p, i, r: full(p, i, r, True))
    xla_g = jax.jit(jax.value_and_grad(
        lambda p, i, r: jnp.sum(full(p, i, r, False)), (0, 1)))
    pls_g = jax.jit(jax.value_and_grad(
        lambda p, i, r: jnp.sum(full(p, i, r, True)), (0, 1)))

    np.testing.assert_allclose(
        np.asarray(xla_f(params, interp, raw)),
        np.asarray(pls_f(params, interp, raw)), atol=5e-4,
    )
    return {
        "xla_fwd_us": time_fn(xla_f, params, interp, raw) * 1e6,
        "pallas_fwd_us": time_fn(pls_f, params, interp, raw) * 1e6,
        "xla_fwdbwd_us": time_fn(xla_g, params, interp, raw) * 1e6,
        "pallas_fwdbwd_us": time_fn(pls_g, params, interp, raw) * 1e6,
    }


def main():
    print(f"backend: {jax.devices()}", file=sys.stderr)
    for b, t in SHAPES:
        for op, fn in (("sci", bench_sci), ("rbf", bench_rbf)):
            res = {k: round(v, 1) for k, v in fn(b, t).items()}
            print(json.dumps({"op": op, "B": b, "T": t, **res}))


if __name__ == "__main__":
    main()
