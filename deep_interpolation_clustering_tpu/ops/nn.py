"""Primitive layers: linear, batch-norm, dropout, MLP heads.

Parameter layout follows the torch convention (`w: (out, in)`, `y = x@w.T+b`)
so torch checkpoints map 1:1 into these pytrees for parity checks.
Initializers reproduce torch's defaults distributionally (the reference never
seeds torch, so bit-exact init parity is undefined; same-weights-in ->
same-outputs-out is the parity contract).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

BN_EPS = 1e-5  # torch BatchNorm1d default
BN_MOMENTUM = 0.1  # torch BatchNorm1d default


# ---------------------------------------------------------------- linear
def linear_init(key: Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> Dict:
    """torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for both
    weight (kaiming_uniform with a=sqrt(5)) and bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (out_dim, in_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def linear_apply(p: Dict, x: Array) -> Array:
    return x @ p["w"].T + p["b"]


# ------------------------------------------------------------ batch norm
def batchnorm_init(dim: int, dtype=jnp.float32) -> Tuple[Dict, Dict]:
    """Returns (params, state): affine weights and running statistics."""
    params = {"gamma": jnp.ones((dim,), dtype), "beta": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


def batchnorm_apply(
    p: Dict, state: Dict, x: Array, train: bool
) -> Tuple[Array, Dict]:
    """BatchNorm over the leading axes of `(N, dim)` rows.

    Matches torch BatchNorm1d semantics: training normalizes with biased
    batch variance and updates running stats with the unbiased variance;
    eval normalizes with running stats. Under jit with batch-sharded inputs
    the means below are global-batch reductions (XLA inserts the
    collectives), reproducing the reference's single-process global-batch
    statistics across a data-parallel mesh.
    """
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.mean(jnp.square(x - mean), axis=0)  # biased
        n = x.shape[0]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * p["gamma"] + p["beta"]
    return y, new_state


# --------------------------------------------------------------- dropout
def dropout(key: Optional[Array], x: Array, rate: float, train: bool) -> Array:
    """torch nn.Dropout: zero with prob `rate`, scale kept units by 1/(1-rate)."""
    if not train or rate == 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ------------------------------------------------------------- MLP heads
def head_init(key: Array, in_dim: int, hidden: int, out_dim: int, dtype=jnp.float32):
    """Linear -> BN -> Dropout -> Linear head (AuxFc/FuturePredFc/FakeDetFc
    share this trunk, reference pretrain_interp.py:43-87)."""
    k1, k2 = jax.random.split(key)
    bn_p, bn_s = batchnorm_init(hidden, dtype)
    params = {
        "fc1": linear_init(k1, in_dim, hidden, dtype),
        "bn": bn_p,
        "fc2": linear_init(k2, hidden, out_dim, dtype),
    }
    return params, {"bn": bn_s}


def head_apply(
    p: Dict,
    state: Dict,
    x: Array,
    rate: float,
    train: bool,
    key: Optional[Array],
    relu: bool = False,
) -> Tuple[Array, Dict]:
    """Apply the shared head trunk. `relu=True` inserts the ReLU used by
    CompressFC (reference rbf.py:116-122); the aux heads have none."""
    h = linear_apply(p["fc1"], x)
    h, bn_s = batchnorm_apply(p["bn"], state["bn"], h, train)
    if relu:
        h = jax.nn.relu(h)
    h = dropout(key, h, rate, train)
    y = linear_apply(p["fc2"], h)
    return y, {"bn": bn_s}
