"""Radix-select schedule A/B on the real chip.

Two findings this file measured (r3), recorded in PARITY.md:

1. Multi-bit radix passes LOSE. The per-pass count-reduction over a
   (256, 384) tile is VPU-compute-bound (~1.4 us) with only ~0.7 us fixed
   latency, so a g-bit pass (2^g - 1 counts) costs more total count work
   than g one-bit passes: measured 63 us (g=1) / 74 (g=2) / 103 (g=3) /
   248 (g=5) / 405 (g=6) per call at B=256/T=354. One count per fixed bit
   is reduction-minimal and reductions are what's paid.

2. The position bits need no radix passes at all. Radixing only the
   random key bits (21 of 30 at T=354) and filling threshold ties in
   position order with one MXU triangular-matmul cumsum computes the
   IDENTICAL mask (same (rand, pos)-lexicographic order) — trading nine
   ~1.4 us passes for one ~1.5 us matmul. This is the shipped kernel
   (`ops/pallas_select._select_kernel`).

This benchmark times the shipped two-stage kernel against a reconstructed
legacy full-key 30-pass kernel and checks both against the sort-based XLA
fallback (the exactness oracle, unchanged by the kernel rework).

Run on the chip: `python benchmarks/radix_ab.py`
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deep_interpolation_clustering_tpu.ops import pallas_select as ps

SHAPES = [(256, 6, 354), (4096, 6, 48)]


def _legacy_kernel(bits_ref, nv_ref, k_ref, out_ref, *, t_len):
    """The pre-r3 schedule: radix all _KEY_BITS of the packed (rand | pos)
    keys — kept here as the A/B reference implementation."""
    combined = ps._combined_keys(bits_ref[:], nv_ref[:], t_len)
    k = k_ref[:]
    kth = ps._radix_kth(combined, k, ps._KEY_BITS)
    sel = (combined <= kth) & (k > 0)
    out_ref[:] = sel.astype(jnp.float32)


def _legacy_pallas(bits, n_valid, k):
    rows, t_len = bits.shape
    rows_pad = ps._round_up(rows, ps._ROW_TILE)
    t_pad = ps._round_up(t_len, 128)
    bits_p = jnp.pad(bits, ((0, rows_pad - rows), (0, t_pad - t_len)))
    nv_p = jnp.pad(n_valid, ((0, rows_pad - rows), (0, 0)))
    k_p = jnp.pad(k, ((0, rows_pad - rows), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_legacy_kernel, t_len=t_len),
        grid=(rows_pad // ps._ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ps._ROW_TILE, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ps._ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ps._ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ps._ROW_TILE, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_pad, t_pad), jnp.float32),
    )(bits_p, nv_p, k_p)
    return out[:rows, :t_len] > 0


def make_inputs(rng, b, c, t):
    bits = rng.randint(0, 2**32, size=(b, c, t), dtype=np.uint32)
    n_valid = rng.randint(1, t + 1, size=(b, c)).astype(np.int32)
    k = np.maximum(1, (0.5 * n_valid).astype(np.int32))
    return jnp.asarray(bits), jnp.asarray(n_valid), jnp.asarray(k)


def _timed(f):
    t0 = time.perf_counter()
    jax.device_get(f())
    return time.perf_counter() - t0


def time_fn(fn, *args, iters=600):
    """Scan-in-one-dispatch slope timing (see pallas_vs_xla.py); the carry
    xors the bits so each iteration's select is serially dependent."""

    def loop(n):
        @jax.jit
        def run():
            def body(carry, _):
                out = fn(args[0] ^ carry, *args[1:])
                tot = jnp.sum(out.astype(jnp.int32))
                return (tot & 1).astype(jnp.uint32), None

            c, _ = jax.lax.scan(body, jnp.uint32(0), None, length=n)
            return c

        return run

    short, long_ = loop(iters // 4), loop(iters)
    int(jax.device_get(short()))
    int(jax.device_get(long_()))
    t0 = min(_timed(short) for _ in range(5))
    t1 = min(_timed(long_) for _ in range(5))
    return (t1 - t0) / (iters - iters // 4)


def main():
    rng = np.random.RandomState(0)
    for b, c, t in SHAPES:
        bits, nv, k = make_inputs(rng, b, c, t)
        bits2 = bits.reshape(b * c, t)
        nv2 = nv.reshape(b * c, 1)
        k2 = k.reshape(b * c, 1)
        ref = np.asarray(jax.jit(ps._select_xla)(bits2, nv2, k2))
        variants = [
            ("legacy_fullkey_30pass", jax.jit(_legacy_pallas)),
            ("rand_radix+tiefill_unpacked", jax.jit(ps._select_pallas)),
        ]
        g = ps._pack_factor(t)
        if g >= 2:
            variants.append((
                f"lane_packed_g{g} (shipped at this T)",
                jax.jit(lambda bb, n, kk, g=g: ps._select_pallas_packed(bb, n, kk, g)),
            ))
        for name, fn in variants:
            got = np.asarray(fn(bits2, nv2, k2))
            exact = bool((got == ref).all())
            us = time_fn(fn, bits2, nv2, k2) * 1e6
            print(
                json.dumps(
                    {
                        "shape": [b, c, t],
                        "scheme": name,
                        "us_per_call": round(us, 1),
                        "exact_vs_sort": exact,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
