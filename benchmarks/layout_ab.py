"""A/B: R-minor (current) vs T-minor layouts for the SCI / RBF hot chains.

Hypothesis (pallas_guide: f32 tiles are (8 sublanes, 128 lanes), minor dim
always maps to lanes): every `(B, C, T, R=6)` intermediate in sci_forward /
rbf_decode runs the VPU at ~6/128 lane utilization and pads VMEM tiles
21x. Transposing the broadcast chains so T=354 (pads to 384, ~8% waste) is
minor should speed up the bandwidth/VPU-bound forward+backward.

Candidates produce identical math (same reduction axis content, possibly
different accumulation order -> <=1e-6 drift, inside the 1e-5 contract).

Run: `python benchmarks/layout_ab.py`
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

from deep_interpolation_clustering_tpu.ops.interpolation import (
    TRANSIENT_KAPPA,
    reference_times,
    sci_forward,
    split_planes,
)
from deep_interpolation_clustering_tpu.ops.rbf import (
    RBF_NORM_EPS,
    basis_func_dict,
)

B, C, T, R, HOURS = 512, 6, 354, 6, 6.0  # 2B rows: real+fake streams


def sci_forward_tmin(kernel, x, ref_points, hours_look_ahead):
    """T-minor variant: all (B, C, R, T) intermediates."""
    d_dim = kernel.shape[0]
    x_t, mask, t_obs, _ = split_planes(x, d_dim)
    ref_t = reference_times(ref_points, hours_look_ahead, x.dtype)

    diff = t_obs[:, :, None, :] - ref_t[:, None]  # (B, C, R, T)
    norm = diff * diff
    alpha = jnp.log1p(jnp.exp(kernel))

    log_mask = jnp.log(mask)[:, :, None, :]  # (B, C, 1, T)
    logits = -alpha[None, :, None, None] * norm + log_mask

    w = jax.nn.logsumexp(logits, axis=-1)  # (B, C, R)
    y = jnp.sum(jnp.exp(logits - w[..., None]) * x_t[:, :, None, :], axis=-1)

    logits_t = TRANSIENT_KAPPA * (-alpha[None, :, None, None] * norm) + log_mask
    w_t = jax.nn.logsumexp(logits_t, axis=-1)
    y_trans = jnp.sum(
        jnp.exp(logits_t - w_t[..., None]) * x_t[:, :, None, :], axis=-1
    )

    rep = jnp.concatenate([y, w, y_trans], axis=1)  # (B, 3C, R)
    return jnp.transpose(rep, (0, 2, 1))


# Baseline arm: the SHIPPED R-minor push, imported (not copied) so the A/B
# always measures the production code
from deep_interpolation_clustering_tpu.ops.rbf import rbf_push  # noqa: E402


def rbf_push_tmin(kernel, proj, raw_input, ref_points, hours_look_ahead):
    """T-minor RBF push: (B, C, R, T) intermediates, reduce over R."""
    out_dim = kernel.shape[0]
    m = raw_input[:, out_dim : 2 * out_dim, :]
    t_obs = raw_input[:, 2 * out_dim : 3 * out_dim, :]
    ref_t = reference_times(ref_points, hours_look_ahead, raw_input.dtype)
    distances = jnp.abs(t_obs[:, :, None, :] - ref_t[:, None])  # (B, C, R, T)
    beta = jnp.log1p(jnp.exp(kernel))
    phi = basis_func_dict()["gaussian"](beta[None, :, None, None], distances)
    phi = phi * m[:, :, None, :]
    norm = jnp.sum(phi, axis=2)  # (B, C, T)
    y = jnp.sum(phi * proj[..., None], axis=2)
    return y / (norm + RBF_NORM_EPS) * m


def time_scan(fn, iters=2000, repeats=5):
    def scanned(key):
        def body(carry, i):
            out = fn(jax.random.fold_in(key, i))
            s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out))
            return carry + s.astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return tot

    jfn = jax.jit(scanned)
    key = jax.random.PRNGKey(0)
    jfn(key).block_until_ready()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jfn(key).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    rng = np.random.RandomState(0)
    mask = (np.arange(T)[None, None, :]
            < rng.randint(20, T + 1, size=(B, C))[:, :, None]).astype(np.float32)
    ob = (rng.rand(B, C, T).astype(np.float32) * 5 - 2.5) * mask
    ts = np.sort(rng.rand(B, C, T).astype(np.float32) * HOURS, axis=-1) * mask
    x = jnp.asarray(np.concatenate([ob, mask, ts, mask], axis=1))
    kernel = jnp.asarray(rng.rand(C).astype(np.float32))
    proj = jnp.asarray(rng.randn(B, C, R).astype(np.float32))

    # correctness first
    a = jax.jit(lambda: sci_forward(kernel, x, R, HOURS))()
    b = jax.jit(lambda: sci_forward_tmin(kernel, x, R, HOURS))()
    d_sci = float(jnp.max(jnp.abs(a - b)))
    pa = jax.jit(lambda: rbf_push(kernel, proj, x, R, HOURS))()
    pb = jax.jit(lambda: rbf_push_tmin(kernel, proj, x, R, HOURS))()
    d_rbf = float(jnp.max(jnp.abs(pa - pb)))
    print(json.dumps({"sci_max_diff": d_sci, "rbf_max_diff": d_rbf}))

    def grad_of(f):
        g = jax.grad(lambda k, xx: jnp.sum(f(k, xx)), argnums=(0, 1))
        return g

    def jit_k(k):
        # value-preserving key dependence so XLA cannot hoist the body out
        # of the timing scan (1e-38 is sub-ulp for this kernel's range)
        return kernel + (k[0] & 1).astype(jnp.float32) * 1e-38

    rows = {}
    rows["sci_fwd_rmin"] = time_scan(
        lambda k: sci_forward(jit_k(k), x, R, HOURS))
    rows["sci_fwd_tmin"] = time_scan(
        lambda k: sci_forward_tmin(jit_k(k), x, R, HOURS))
    g_r = jax.grad(lambda kk, xx: jnp.sum(sci_forward(kk, xx, R, HOURS)),
                   argnums=(0, 1))
    g_t = jax.grad(lambda kk, xx: jnp.sum(sci_forward_tmin(kk, xx, R, HOURS)),
                   argnums=(0, 1))
    rows["sci_fwdbwd_rmin"] = time_scan(lambda k: g_r(jit_k(k), x))
    rows["sci_fwdbwd_tmin"] = time_scan(lambda k: g_t(jit_k(k), x))

    rows["rbf_fwd_rmin"] = time_scan(
        lambda k: rbf_push(jit_k(k), proj, x, R, HOURS))
    rows["rbf_fwd_tmin"] = time_scan(
        lambda k: rbf_push_tmin(jit_k(k), proj, x, R, HOURS))
    gr_r = jax.grad(lambda kk, pp: jnp.sum(rbf_push(kk, pp, x, R, HOURS)),
                    argnums=(0, 1))
    gr_t = jax.grad(lambda kk, pp: jnp.sum(rbf_push_tmin(kk, pp, x, R, HOURS)),
                    argnums=(0, 1))
    rows["rbf_fwdbwd_rmin"] = time_scan(lambda k: gr_r(jit_k(k), proj))
    rows["rbf_fwdbwd_tmin"] = time_scan(lambda k: gr_t(jit_k(k), proj))

    for name, sec in rows.items():
        print(json.dumps({"case": name, "us_per_iter": round(1e6 * sec, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
