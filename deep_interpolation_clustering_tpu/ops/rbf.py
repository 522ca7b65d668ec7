"""RBF decoder: gridded decoder states -> values at irregular timestamps.

Functional re-expression of the reference RBF layer (rbf.py:15-125): a
TimeDistributed compression MLP projects the `(B, R, 2H)` decoder outputs to
per-channel values at the R reference points, then per-channel
softplus-positive RBF weights over |t_obs - ref_t| push them back onto each
channel's observed irregular timestamps, normalized by the summed masked
weights (`+ 1e-10`) and re-masked.

The full 11-basis-function library is reproduced (rbf.py:129-202); only
'gaussian' is wired into the model, matching the reference
(pretrain_interp.py:116).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .interpolation import reference_times, to_planes
from .numerics import softplus_refined
from . import nn

Array = jax.Array

RBF_NORM_EPS = 1e-10  # reference rbf.py:107


# ------------------------------------------------------- basis functions
def gaussian(beta, alpha):
    return jnp.exp(-beta * jnp.square(alpha))


def linear(beta, alpha):
    return alpha


def quadratic(beta, alpha):
    return jnp.square(alpha)


def inverse_quadratic(beta, alpha):
    return 1.0 / (1.0 + jnp.square(alpha))


def multiquadric(beta, alpha):
    return jnp.sqrt(1.0 + jnp.square(alpha))


def inverse_multiquadric(beta, alpha):
    return 1.0 / jnp.sqrt(1.0 + jnp.square(alpha))


def spline(beta, alpha):
    return jnp.square(alpha) * jnp.log(alpha + 1.0)


def poisson_one(beta, alpha):
    return (alpha - 1.0) * jnp.exp(-alpha)


def poisson_two(beta, alpha):
    return ((alpha - 2.0) / 2.0) * alpha * jnp.exp(-alpha)


def matern32(beta, alpha):
    return (1.0 + 3**0.5 * alpha) * jnp.exp(-(3**0.5) * alpha)


def matern52(beta, alpha):
    return (1.0 + 5**0.5 * alpha + (5.0 / 3.0) * jnp.square(alpha)) * jnp.exp(
        -(5**0.5) * alpha
    )


def basis_func_dict() -> Dict[str, Callable]:
    return {
        "gaussian": gaussian,
        "linear": linear,
        "quadratic": quadratic,
        "inverse quadratic": inverse_quadratic,
        "multiquadric": multiquadric,
        "inverse multiquadric": inverse_multiquadric,
        "spline": spline,
        "poisson one": poisson_one,
        "poisson two": poisson_two,
        "matern32": matern32,
        "matern52": matern52,
    }


# ----------------------------------------------------------- RBF decoder
def rbf_init(
    key: Array, in_dim: int, out_dim: int, hidden: int = 128, dtype=jnp.float32
) -> Tuple[Dict, Dict]:
    """Params/state of the RBF decoder: per-channel kernel ~ U[0,1)
    (reference rbf.py:50) plus the CompressFC trunk."""
    k_kernel, k_head = jax.random.split(key)
    compress_p, compress_s = nn.head_init(k_head, in_dim, hidden, out_dim, dtype)
    params = {
        "kernel": jax.random.uniform(k_kernel, (out_dim,), dtype),
        "compress": compress_p,
    }
    return params, {"compress": compress_s}


def rbf_push(
    kernel: Array,
    proj: Array,
    raw_input: Array,
    ref_points: int,
    hours_look_ahead: float,
    basis: str = "gaussian",
    use_pallas: bool = False,
) -> Array:
    """Push per-channel values `proj: (B, C, R)` at the reference points
    back onto each channel's observed irregular timestamps -> `(B, C, T)`
    (reference rbf.py:57-108, minus the CompressFC trunk — see rbf_decode).
    `use_pallas` routes the gaussian push through the fused TPU kernel
    (ops/pallas_interp.py)."""
    out_dim = kernel.shape[0]

    if use_pallas and basis == "gaussian":
        from .pallas_interp import rbf_project_pallas

        return rbf_project_pallas(
            kernel, proj, raw_input, ref_points, hours_look_ahead
        )

    _, m, t_obs, _ = to_planes(raw_input, out_dim)  # mask / timestamps
    ref_t = reference_times(ref_points, hours_look_ahead, t_obs.dtype)

    # |t_obs - ref_t| — the reference computes (d^2)^0.5 (rbf.py:76)
    distances = jnp.abs(t_obs[..., None] - ref_t)  # (B, C, T, R)
    # softplus positivity (:78), Newton-refined log (the chip's raw log1p is
    # ~300 ulp off — ops/numerics.py; beta multiplies squared distances)
    beta = softplus_refined(kernel)

    phi = basis_func_dict()[basis](beta[None, :, None, None], distances)
    phi = phi * m[..., None]  # mask out padded observations (:96)
    norm = jnp.sum(phi, axis=-1)  # (B, C, T)

    y = jnp.sum(phi * proj[:, :, None, :], axis=-1)  # (B, C, T)
    return y / (norm + RBF_NORM_EPS) * m  # (:107)


def rbf_decode(
    params: Dict,
    state: Dict,
    interp_data: Array,
    raw_input: Array,
    ref_points: int,
    hours_look_ahead: float,
    dropout_rate: float,
    train: bool,
    dropout_key: Optional[Array] = None,
    basis: str = "gaussian",
    use_pallas: bool = False,
) -> Tuple[Array, Dict]:
    """Decode `(B, R, in_dim)` gridded states to `(B, C, T)` observations.

    `raw_input` is the stacked `(B, 4C, T)` tensor; its mask and timestamp
    planes select where to evaluate (reference rbf.py:57-108).
    `use_pallas` routes the gaussian RBF push through the fused TPU kernel
    (ops/pallas_interp.py); the CompressFC matmul trunk always stays XLA.
    (The model's fused-heads path runs this trunk batched with the aux/fake
    trunks — nn.heads_apply_fused — and calls `rbf_push` directly.)
    """
    out_dim = params["kernel"].shape[0]

    # CompressFC over the R reference points: (B, R, in) -> (B, R, C).
    # BatchNorm sees B*R rows, matching TimeDistributed+BatchNorm1d
    # (reference rbf.py:111-125, utils.py:202-224).
    b_sz, r, in_dim = interp_data.shape
    flat = interp_data.reshape(b_sz * r, in_dim)
    proj, compress_s = nn.head_apply(
        params["compress"], state["compress"], flat, dropout_rate, train,
        dropout_key, relu=True,
    )
    proj = proj.reshape(b_sz, r, out_dim)
    proj = jnp.transpose(proj, (0, 2, 1))  # (B, C, R)

    y = rbf_push(
        params["kernel"], proj, raw_input, ref_points, hours_look_ahead,
        basis, use_pallas,
    )
    return y, {"compress": compress_s}
