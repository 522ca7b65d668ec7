"""Fused Pallas TPU kernels for the interpolation hot ops.

The two bandwidth-bound ops of the network (SURVEY.md §3.2) both sweep a
`(B, C, T, R)` broadcast grid: SingleChannelInterp reduces it over T
(irregular observations -> R reference points) and the RBF decoder reduces
it over R (reference points -> irregular observations). The jnp versions
let XLA materialize several (B, C, T, R) intermediates in HBM; these
kernels flatten (B, C) into rows, tile rows across the grid, keep the whole
T extent in VMEM, and unroll the tiny R=6 axis in registers — one HBM read
of the (rows, T) planes, one write of the outputs, nothing else.

Numerics follow `interpolation.sci_forward` / `rbf.rbf_decode`'s gaussian
path exactly in formula (same masked logsumexp, same kappa=10 transient
sharpening, same `+1e-10` normalizer). Measured on-chip agreement vs the
XLA path: RBF bit-exact; SCI within ~1e-4 (Mosaic's exp/log approximations
differ slightly from XLA's on the kappa-sharpened logits) — which is why
`Config.use_pallas` stays off on the 1e-5 parity path. Backward passes go
through
`jax.custom_vjp` with the jnp reference implementation, so training gets
XLA's fused autodiff while the forward (the serving / feature-dump path)
gets the handwritten kernel.

Note on the (B, C, T, R) layout choice: T (lanes) is padded to 128s and
rows (sublanes) to 8s; R never touches the memory layout at all.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .interpolation import TRANSIENT_KAPPA, reference_times, to_planes
from .rbf import RBF_NORM_EPS

Array = jax.Array

_NEG_INF = -1e30  # large-negative stand-in for log(0); exp() underflows to 0


def _interpret() -> bool:
    """Run kernels through the interpreter off-TPU (tests on CPU meshes)."""
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ======================================================================
# SingleChannelInterp: (B, 4C, T) -> (B, R, 3C), reduction over T
# ======================================================================
def _sci_kernel(x_ref, t_ref, neg_ref, alpha_ref, ref_t_ref, out_ref, *, r_pts):
    """One row tile: x/t/neg are (TILE, T); alpha is (TILE, 1);
    out is (TILE, 3*R) packed [y | w | y_trans] along the last axis."""
    x = x_ref[:]
    t = t_ref[:]
    neg = neg_ref[:]  # 0 where observed, _NEG_INF where padded (= log mask)
    alpha = alpha_ref[:]  # (TILE, 1)

    ys, ws, yts = [], [], []
    for r in range(r_pts):
        ref_t = ref_t_ref[0, r]
        d2 = jnp.square(t - ref_t)
        logits = -alpha * d2 + neg
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=1, keepdims=True)
        ws.append(m + jnp.log(s))  # (TILE, 1) logsumexp
        ys.append(jnp.sum(e * x, axis=1, keepdims=True) / s)

        logits_t = TRANSIENT_KAPPA * (-alpha * d2) + neg
        m_t = jnp.max(logits_t, axis=1, keepdims=True)
        e_t = jnp.exp(logits_t - m_t)
        s_t = jnp.sum(e_t, axis=1, keepdims=True)
        yts.append(jnp.sum(e_t * x, axis=1, keepdims=True) / s_t)

    out_ref[:] = jnp.concatenate(ys + ws + yts, axis=1)


def _sci_pallas_raw(
    kernel: Array, x: Array, ref_points: int, hours_look_ahead: float
) -> Array:
    c = kernel.shape[0]
    x_t, mask, t_obs, _ = to_planes(x, c)
    b, _, t_len = x_t.shape
    alpha = jnp.log1p(jnp.exp(kernel))  # softplus, matches sci_forward

    rows = b * c
    tile = 256
    rows_pad = _round_up(rows, tile)
    t_pad = _round_up(t_len, 128)

    def prep(a, fill=0.0):
        a = a.reshape(rows, t_len)
        return jnp.pad(a, ((0, rows_pad - rows), (0, t_pad - t_len)),
                       constant_values=fill)

    xr = prep(x_t)
    tr = prep(t_obs)
    # log(mask): 0 where observed, -inf where padded; T-padding is also "padded"
    neg = jnp.where(prep(mask, fill=0.0) > 0, 0.0, _NEG_INF)
    alpha_rows = jnp.tile(alpha, b)
    alpha_rows = jnp.pad(alpha_rows, (0, rows_pad - rows))[:, None]  # (rows, 1)
    ref_t = reference_times(ref_points, hours_look_ahead, x_t.dtype)[None, :]

    out = pl.pallas_call(
        functools.partial(_sci_kernel, r_pts=ref_points),
        grid=(rows_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ref_points), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, 3 * ref_points), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_pad, 3 * ref_points), x_t.dtype),
        interpret=_interpret(),
    )(xr, tr, neg, alpha_rows, ref_t)

    out = out[:rows].reshape(b, c, 3, ref_points)
    # pack to (B, R, 3C) with channel-major [y_0..y_C | w_0..w_C | yt_0..yt_C]
    out = jnp.transpose(out, (0, 2, 1, 3))  # (B, 3, C, R)
    out = out.reshape(b, 3 * c, ref_points)
    return jnp.transpose(out, (0, 2, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sci_forward_pallas(kernel, x, ref_points: int, hours_look_ahead: float):
    """Drop-in replacement for `interpolation.sci_forward` with a fused
    TPU kernel forward; backward runs XLA autodiff of the jnp reference."""
    return _sci_pallas_raw(kernel, x, ref_points, hours_look_ahead)


def _sci_fwd(kernel, x, ref_points, hours_look_ahead):
    return _sci_pallas_raw(kernel, x, ref_points, hours_look_ahead), (kernel, x)


def _sci_bwd(ref_points, hours_look_ahead, res, g):
    from .interpolation import sci_forward

    kernel, x = res
    _, vjp = jax.vjp(lambda k, xx: sci_forward(k, xx, ref_points, hours_look_ahead),
                     kernel, x)
    return vjp(g)


sci_forward_pallas.defvjp(_sci_fwd, _sci_bwd)


# ======================================================================
# RBF decode: (B, R, in) states + (B, 4C, T) raw -> (B, C, T), reduce over R
# ======================================================================
def _rbf_kernel(t_ref, m_ref, proj_ref, beta_ref, ref_t_ref, out_ref, *, r_pts):
    """One row tile: t/m are (TILE, T); proj is (TILE, R); out (TILE, T)."""
    t = t_ref[:]
    m = m_ref[:]
    beta = beta_ref[:]  # (TILE, 1)
    num = jnp.zeros_like(t)
    den = jnp.zeros_like(t)
    for r in range(r_pts):
        ref_t = ref_t_ref[0, r]
        # gaussian basis on |t - ref_t| (the reference squares then sqrts,
        # rbf.py:76; |.|^2 == (.)^2 so phi is identical)
        phi = jnp.exp(-beta * jnp.square(t - ref_t)) * m
        num = num + phi * proj_ref[:, r : r + 1]
        den = den + phi
    out_ref[:] = num / (den + RBF_NORM_EPS) * m


def _rbf_pallas_raw(
    kernel: Array, proj: Array, raw_input: Array,
    ref_points: int, hours_look_ahead: float,
) -> Array:
    """`proj` is the compressed per-channel grid values (B, C, R) — the
    CompressFC trunk stays in XLA (it is a dense matmul, already optimal)."""
    b, c, _ = proj.shape
    _, m, t_obs, _ = to_planes(raw_input, c)
    t_len = m.shape[-1]
    beta = jnp.log1p(jnp.exp(kernel))

    rows = b * c
    tile = 256
    rows_pad = _round_up(rows, tile)
    t_pad = _round_up(t_len, 128)

    def prep(a):
        a = a.reshape(rows, t_len)
        return jnp.pad(a, ((0, rows_pad - rows), (0, t_pad - t_len)))

    tr, mr = prep(t_obs), prep(m)
    proj_r = jnp.pad(proj.reshape(rows, ref_points), ((0, rows_pad - rows), (0, 0)))
    beta_rows = jnp.pad(jnp.tile(beta, b), (0, rows_pad - rows))[:, None]
    ref_t = reference_times(ref_points, hours_look_ahead, m.dtype)[None, :]

    out = pl.pallas_call(
        functools.partial(_rbf_kernel, r_pts=ref_points),
        grid=(rows_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, ref_points), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ref_points), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, t_pad), m.dtype),
        interpret=_interpret(),
    )(tr, mr, proj_r, beta_rows, ref_t)

    return out[:rows, :t_len].reshape(b, c, t_len)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def rbf_project_pallas(kernel, proj, raw_input, ref_points: int, hours_look_ahead: float):
    """Fused RBF push of gridded per-channel values (B, C, R) back onto the
    irregular observed timestamps -> (B, C, T)."""
    return _rbf_pallas_raw(kernel, proj, raw_input, ref_points, hours_look_ahead)


def _rbf_jnp_reference(kernel, proj, raw_input, ref_points, hours_look_ahead):
    """jnp mirror of the kernel math (used for the custom backward)."""
    c = proj.shape[1]
    _, m, t_obs, _ = to_planes(raw_input, c)
    ref_t = reference_times(ref_points, hours_look_ahead, m.dtype)
    beta = jnp.log1p(jnp.exp(kernel))
    phi = jnp.exp(-beta[None, :, None, None] * jnp.square(t_obs[..., None] - ref_t))
    phi = phi * m[..., None]
    num = jnp.sum(phi * proj[:, :, None, :], axis=-1)
    den = jnp.sum(phi, axis=-1)
    return num / (den + RBF_NORM_EPS) * m


def _rbf_fwd(kernel, proj, raw_input, ref_points, hours_look_ahead):
    out = _rbf_pallas_raw(kernel, proj, raw_input, ref_points, hours_look_ahead)
    return out, (kernel, proj, raw_input)


def _rbf_bwd(ref_points, hours_look_ahead, res, g):
    kernel, proj, raw_input = res
    # raw_input is differentiated too: its timestamp/mask planes get real
    # cotangents, matching the XLA rbf_decode path (they are data today, but
    # a learned augmentation would silently lose gradients otherwise)
    _, vjp = jax.vjp(
        lambda k, p, ri: _rbf_jnp_reference(k, p, ri, ref_points, hours_look_ahead),
        kernel, proj, raw_input,
    )
    return vjp(g)


rbf_project_pallas.defvjp(_rbf_fwd, _rbf_bwd)


# ======================================================================
# SCI backward: fused recompute-in-VMEM VJP (XLA forward stays primal)
# ======================================================================
def _sci_bwd_kernel(
    x_ref, t_ref, neg_ref, alpha_ref, ref_t_ref, gy_ref, gw_ref, gyt_ref,
    dx_ref, dt_ref, dm_ref, dalpha_ref, *, r_pts,
):
    """One row tile of the SCI VJP.

    XLA's autodiff of the logsumexp/softmax chains materializes the
    (B, C, T, R)-scale softmax tensors in HBM between forward and backward
    (the ~13 MB multiply_reduce fusions in the r3 trace, running at memory
    bandwidth). This kernel re-derives them in VMEM from one read of the
    (rows, T) planes and emits only the input-sized cotangents:

      p_jr = softmax_T(-a d^2 + log m),  y_r = sum_j p x
      glog_jr  = p (gw_r + gy_r (x - y_r))              [smooth+intensity]
      glogt_jr = q gyt_r (x - yt_r), q = softmax(kappa..)  [transient]
      gl = glog + kappa glogt
      dx_j  = sum_r (gy p + gyt q)
      da    = -sum_{j,r} gl d^2          (per row; -> dtheta outside)
      dt_j  = -2 a sum_r gl d
      dm_j  = sum_r (glog + glogt)       (d log(m)/dm = 1 at m=1; 0 rows
                                          where m=0 since p=q=0 there —
                                          the jnp path NaNs those entries)
    """
    x = x_ref[:]
    t = t_ref[:]
    neg = neg_ref[:]
    alpha = alpha_ref[:]  # (TILE, 1)
    dx = jnp.zeros_like(x)
    dt = jnp.zeros_like(x)
    dm = jnp.zeros_like(x)
    dal = jnp.zeros_like(alpha)
    for r in range(r_pts):
        ref_t = ref_t_ref[0, r]
        d = t - ref_t
        d2 = d * d
        gy = gy_ref[:, r : r + 1]
        gw = gw_ref[:, r : r + 1]
        gyt = gyt_ref[:, r : r + 1]

        logits = -alpha * d2 + neg
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=1, keepdims=True)
        p = e / s
        y = jnp.sum(p * x, axis=1, keepdims=True)
        glog = p * (gw + gy * (x - y))

        logits_t = TRANSIENT_KAPPA * (-alpha * d2) + neg
        m_t = jnp.max(logits_t, axis=1, keepdims=True)
        e_t = jnp.exp(logits_t - m_t)
        s_t = jnp.sum(e_t, axis=1, keepdims=True)
        q = e_t / s_t
        yt = jnp.sum(q * x, axis=1, keepdims=True)
        glogt = q * (gyt * (x - yt))

        gl = glog + TRANSIENT_KAPPA * glogt
        dx = dx + gy * p + gyt * q
        dal = dal - jnp.sum(gl * d2, axis=1, keepdims=True)
        dt = dt - 2.0 * alpha * d * gl
        dm = dm + glog + glogt
    dx_ref[:] = dx
    dt_ref[:] = dt
    dm_ref[:] = dm
    dalpha_ref[:] = dal


def _sci_bwd_pallas(kernel, x, g, ref_points: int, hours_look_ahead: float):
    """Assemble the SCI cotangents: returns (dkernel, d_planes-tuple)."""
    c = kernel.shape[0]
    x_t, mask, t_obs, _ = to_planes(x, c)
    b, _, t_len = x_t.shape
    alpha = jnp.log1p(jnp.exp(kernel))

    rows = b * c
    tile = 256
    rows_pad = _round_up(rows, tile)
    t_pad = _round_up(t_len, 128)

    def prep(a, fill=0.0):
        a = a.reshape(rows, t_len)
        return jnp.pad(a, ((0, rows_pad - rows), (0, t_pad - t_len)),
                       constant_values=fill)

    xr = prep(x_t)
    tr = prep(t_obs)
    # col padding is "unobserved" (-inf), but ROW padding must stay finite:
    # an all--inf row makes the softmax recompute NaN, and NaN * (zero
    # cotangent) still poisons the dalpha sum
    neg_core = jnp.where(prep(mask, fill=0.0) > 0, 0.0, _NEG_INF)
    row_ok = (jnp.arange(rows_pad) < rows)[:, None]
    neg = jnp.where(row_ok, neg_core, 0.0)
    alpha_rows = jnp.pad(jnp.tile(alpha, b), (0, rows_pad - rows))[:, None]
    ref_t = reference_times(ref_points, hours_look_ahead, x_t.dtype)[None, :]

    # cotangent (B, R, 3C) -> three (rows, R) streams, channel-minor rows
    def cot(i):
        gi = g[..., i * c : (i + 1) * c]  # (B, R, C)
        gi = jnp.transpose(gi, (0, 2, 1)).reshape(rows, ref_points)
        return jnp.pad(gi, ((0, rows_pad - rows), (0, 0)))

    gy, gw, gyt = cot(0), cot(1), cot(2)

    plane = jax.ShapeDtypeStruct((rows_pad, t_pad), x_t.dtype)
    specs_plane = pl.BlockSpec((tile, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    specs_r = pl.BlockSpec((tile, ref_points), lambda i: (i, 0), memory_space=pltpu.VMEM)
    specs_1 = pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dx, dt, dm, dal = pl.pallas_call(
        functools.partial(_sci_bwd_kernel, r_pts=ref_points),
        grid=(rows_pad // tile,),
        in_specs=[
            specs_plane, specs_plane, specs_plane, specs_1,
            pl.BlockSpec((1, ref_points), lambda i: (0, 0), memory_space=pltpu.VMEM),
            specs_r, specs_r, specs_r,
        ],
        out_specs=(specs_plane, specs_plane, specs_plane, specs_1),
        out_shape=(plane, plane, plane,
                   jax.ShapeDtypeStruct((rows_pad, 1), x_t.dtype)),
        interpret=_interpret(),
    )(xr, tr, neg, alpha_rows, ref_t, gy, gw, gyt)

    unprep = lambda a: a[:rows, :t_len].reshape(b, c, t_len)
    dkernel = jnp.sum(dal[:rows, 0].reshape(b, c), axis=0) * jax.nn.sigmoid(kernel)
    return dkernel, (unprep(dx), unprep(dm), unprep(dt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sci_forward_hybrid(kernel, x, ref_points: int, hours_look_ahead: float):
    """`interpolation.sci_forward` with the UNCHANGED XLA forward as the
    primal (1e-5 parity surface intact) and the fused Pallas VJP above as
    the backward. Gradients agree with XLA autodiff to f32 rounding
    (~1e-7 relative; Mosaic transcendentals differ slightly on TPU).
    Mask-plane cotangents are 0 where mask==0 (the jnp path yields NaN
    there from log(0); both are meaningless for a 0/1 data mask)."""
    from .interpolation import sci_forward

    return sci_forward(kernel, x, ref_points, hours_look_ahead)


def _sci_hybrid_fwd(kernel, x, ref_points, hours_look_ahead):
    from .interpolation import sci_forward

    return sci_forward(kernel, x, ref_points, hours_look_ahead), (kernel, x)


def _sci_hybrid_bwd(ref_points, hours_look_ahead, res, g):
    from .interpolation import Planes

    kernel, x = res
    dkernel, (dx, dm, dt) = _sci_bwd_pallas(kernel, x, g, ref_points, hours_look_ahead)
    if isinstance(x, Planes):
        dplanes = Planes(dx, dm, dt, jnp.zeros_like(x.ae))
    else:
        dplanes = jnp.concatenate([dx, dm, dt, jnp.zeros_like(dx)], axis=1)
    return dkernel, dplanes


sci_forward_hybrid.defvjp(_sci_hybrid_fwd, _sci_hybrid_bwd)
