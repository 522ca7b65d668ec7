"""Temporal kernel interpolation over irregular timestamps.

Re-derivation of the interpolation-prediction network's two layers (Shukla &
Marlin, ICLR'19) for TPU: pure functions over `(B, C, T)` planes instead of
stateful modules, with the `(B, C, T, R)` broadcast chains expressed so XLA
fuses the elementwise work into the T-reductions.

Numerics follow the reference exactly (interpolation_layer.py:31-127):
  * per-channel kernel made positive via softplus `log(1+e^theta)` (:51)
  * masked weights in log space, `+log(mask)` so mask=0 -> -inf (:59)
  * smooth channel = softmax_T-weighted mean of observations (:62-64)
  * intensity channel = logsumexp density (:59)
  * transient channel with kappa=10 sharpened kernel (:80-83)
  * cross-channel mixing `y_hat = softmax_C(w) * (y - mean) @ K + mean`
    with K initialized to identity (:97, :111-113)

The parity path keeps float32 throughout.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp

from .numerics import logsumexp_refined, softplus_refined

Array = jax.Array

# kappa: sharpening factor of the transient (high-pass) channel
# (reference interpolation_layer.py:71,80 — hard constant 10.0)
TRANSIENT_KAPPA = 10.0


class Planes(NamedTuple):
    """The four `(B, C, T)` input planes, unstacked.

    The reference carries them stacked as one `(B, 4C, T)` tensor
    (interpolation_layer.py:26-30) which SCI/RBF immediately re-slice; the
    training path keeps them separate end-to-end — the per-step stack was
    two ~9 MB concats (~38 us/step at B=256, trace r3) whose only consumer
    un-slices them. `to_planes` accepts either form, so stacked arrays
    (torch parity fixtures, external callers) keep working unchanged.
    """

    ob: Array  # observed values (denoised with the ae mask when configured)
    mask: Array  # padding mask
    ts: Array  # timestamps
    ae: Array  # autoencoder hold-out mask


def split_planes(x: Array, d_dim: int) -> Tuple[Array, Array, Array, Array]:
    """Split a stacked `(B, 4C, T)` input into its four `(B, C, T)` planes.

    Plane layout (reference interpolation_layer.py:26-30):
      [0:C]   observed values, [C:2C] padding mask,
      [2C:3C] timestamps,      [3C:4C] autoencoder hold-out mask.
    """
    return (
        x[:, :d_dim, :],
        x[:, d_dim : 2 * d_dim, :],
        x[:, 2 * d_dim : 3 * d_dim, :],
        x[:, 3 * d_dim :, :],
    )


def to_planes(x: Union[Array, Planes], d_dim: int) -> Planes:
    """Normalize a stacked `(B, 4C, T)` array or a `Planes` to `Planes`."""
    if isinstance(x, Planes):
        return x
    return Planes(*split_planes(x, d_dim))


def reference_times(ref_points: int, hours_look_ahead: float, dtype=jnp.float32) -> Array:
    """Uniform reference grid over [0, hours] (reference interpolation_layer.py:41)."""
    return jnp.linspace(0.0, float(hours_look_ahead), ref_points, dtype=dtype)


def sci_forward(
    kernel: Array,
    x: Union[Array, Planes],
    ref_points: int,
    hours_look_ahead: float,
) -> Array:
    """SingleChannelInterp: irregular `(B, 4C, T)` (or `Planes`) ->
    gridded `(B, R, 3C)`.

    Channel layout of the output's last axis: [smooth y | intensity w |
    transient y_trans] (reference interpolation_layer.py:84-86).
    """
    d_dim = kernel.shape[0]
    x_t, mask, t_obs, _ = to_planes(x, d_dim)
    ref_t = reference_times(ref_points, hours_look_ahead, x_t.dtype)

    # (B, C, T, R) squared time distances
    diff = t_obs[..., None] - ref_t
    norm = diff * diff
    # softplus positivity (:51). Newton-refined log: the chip's raw log1p is
    # ~300 ulp off and alpha multiplies norm (<= hours^2) and kappa=10, so
    # those ulps fan out to ~1.5e-2 on the transient logits — the dominant
    # on-chip parity residue (benchmarks/parity_ledger.py, r4)
    alpha = softplus_refined(kernel)

    log_mask = jnp.log(mask)  # 0 -> -inf, exactly as the reference (:59)
    logits = -alpha[None, :, None, None] * norm + log_mask[..., None]

    # intensity channel: log-density of observations around each ref point
    # (refined final log — same chip-log accuracy story as alpha)
    w = logsumexp_refined(logits, axis=2)  # (B, C, R)
    # smooth (low-pass) channel: softmax_T-weighted observation mean
    y = jnp.sum(jnp.exp(logits - w[:, :, None, :]) * x_t[..., None], axis=2)

    # transient (high-pass) channel: kappa-sharpened kernel
    logits_t = TRANSIENT_KAPPA * (-alpha[None, :, None, None] * norm) + log_mask[..., None]
    w_t = logsumexp_refined(logits_t, axis=2)
    y_trans = jnp.sum(jnp.exp(logits_t - w_t[:, :, None, :]) * x_t[..., None], axis=2)

    rep = jnp.concatenate([y, w, y_trans], axis=1)  # (B, 3C, R)
    return jnp.transpose(rep, (0, 2, 1))  # (B, R, 3C)


def sci_forward_multi(
    kernel: Array,
    xs,
    ref_points: int,
    hours_look_ahead: float,
):
    """SCI over several streams that share (mask, ts): the ob-independent
    weight tensors are computed ONCE and each stream contributes only its
    two `(B, C, T, R) -> (B, C, R)` weighted sums.

    SCI's logit/softmax chain depends only on timestamps and padding mask
    (reference interpolation_layer.py:59-83) — the observation plane enters
    the math exclusively through the weighted sums — so for streams sharing
    (mask, ts) (the fake stream at the production default `aug_input=False`,
    steps.py: `fake_ts = ts_raw`, same `padding_mask`) the per-stream
    recompute of the transcendental-heavy grid chain is pure waste.

    Bit-identical to per-stream `sci_forward` by construction: the shared
    tensors are produced by the same op sequence, and each stream's
    `exp(logits - w) * ob -> sum_T` is the same ops in the same order.
    Guarded by tests/test_sci_multi.py.

    The caller is responsible for proving the (mask, ts) sharing — this
    function unconditionally takes them from the first stream.
    """
    d_dim = kernel.shape[0]
    planes = [to_planes(x, d_dim) for x in xs]
    mask, t_obs = planes[0].mask, planes[0].ts
    ref_t = reference_times(ref_points, hours_look_ahead, planes[0].ob.dtype)

    diff = t_obs[..., None] - ref_t
    norm = diff * diff
    alpha = softplus_refined(kernel)

    log_mask = jnp.log(mask)
    logits = -alpha[None, :, None, None] * norm + log_mask[..., None]
    w = logsumexp_refined(logits, axis=2)  # (B, C, R)
    wt = jnp.exp(logits - w[:, :, None, :])

    logits_t = TRANSIENT_KAPPA * (-alpha[None, :, None, None] * norm) + log_mask[..., None]
    w_t = logsumexp_refined(logits_t, axis=2)
    wt_t = jnp.exp(logits_t - w_t[:, :, None, :])

    reps = []
    for p in planes:
        y = jnp.sum(wt * p.ob[..., None], axis=2)
        y_trans = jnp.sum(wt_t * p.ob[..., None], axis=2)
        rep = jnp.concatenate([y, w, y_trans], axis=1)  # (B, 3C, R)
        reps.append(jnp.transpose(rep, (0, 2, 1)))  # (B, R, 3C)
    return reps


def cci_forward(kernel: Array, rep: Array) -> Array:
    """CrossChannelInterp: `(B, R, 3C)` -> `(B, R, 3C)`.

    Mixes channels through a learnable C x C kernel (identity-initialized)
    with intensity-softmax weights across channels; the transient channel is
    re-expressed as the residual from the smoothed estimate
    (reference interpolation_layer.py:99-127).
    """
    d_dim = kernel.shape[0]
    y = rep[..., :d_dim]  # (B, R, C)
    w = rep[..., d_dim : 2 * d_dim]
    y_trans_in = rep[..., 2 * d_dim : 3 * d_dim]

    intensity = jnp.exp(w)
    # softmax of intensity across the channel axis (:108-110)
    den = logsumexp_refined(w, axis=2, keepdims=True)
    w_sm = jnp.exp(w - den)

    mean = jnp.mean(y, axis=1, keepdims=True)  # per-channel time mean (:111-112)
    smooth = jnp.matmul(w_sm * (y - mean), kernel) + mean  # (:113)
    y_trans = y_trans_in - smooth  # residual high-pass (:122-123)

    return jnp.concatenate([smooth, intensity, y_trans], axis=-1)


def cci_identity_kernel(d_dim: int, dtype=jnp.float32) -> Array:
    """Identity init of the cross-channel kernel (reference :97)."""
    return jnp.eye(d_dim, dtype=dtype)
