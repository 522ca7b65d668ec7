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
    p: Dict, state: Dict, x: Array, train: bool, row_mask: Optional[Array] = None
) -> Tuple[Array, Dict]:
    """BatchNorm over the leading axes of `(N, dim)` rows.

    Matches torch BatchNorm1d semantics: training normalizes with biased
    batch variance and updates running stats with the unbiased variance;
    eval normalizes with running stats. Under jit with batch-sharded inputs
    the means below are global-batch reductions (XLA inserts the
    collectives), reproducing the reference's single-process global-batch
    statistics across a data-parallel mesh.

    `row_mask` ((N,), train only): mask-weighted moments over the real rows
    of a shape-padded batch — a padded short batch then reproduces the
    reference's short-batch BN statistics exactly (the padding duplicates
    real rows, which would otherwise bias the moments toward them). Eval
    ignores it (running stats involve no batch reduction).
    """
    if train:
        if row_mask is None:
            mean = jnp.mean(x, axis=0)
            var = jnp.mean(jnp.square(x - mean), axis=0)  # biased
            n = x.shape[0]
            unbiased = var * (n / max(n - 1, 1))
        else:
            m = row_mask[:, None]
            n = jnp.sum(row_mask)
            mean = jnp.sum(x * m, axis=0) / n
            var = jnp.sum(jnp.square(x - mean) * m, axis=0) / n  # biased
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
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
    row_mask: Optional[Array] = None,
) -> Tuple[Array, Dict]:
    """Apply the shared head trunk. `relu=True` inserts the ReLU used by
    CompressFC (reference rbf.py:116-122); the aux heads have none.
    `row_mask` weights the train-mode BN moments (padded-tail batches)."""
    h = linear_apply(p["fc1"], x)
    h, bn_s = batchnorm_apply(p["bn"], state["bn"], h, train, row_mask)
    if relu:
        h = jax.nn.relu(h)
    h = dropout(key, h, rate, train)
    y = linear_apply(p["fc2"], h)
    return y, {"bn": bn_s}


def heads_apply_fused(heads, rate: float, train: bool, key: Optional[Array]):
    """Run SEVERAL head trunks (Linear -> BN -> [ReLU] -> Dropout -> Linear)
    as ONE batched chain: one fc1 gemm over the row-concat of all head
    inputs x the column-concat of all fc1 weights, one BN normalize pass,
    one masked ReLU, one dropout draw, one block-diagonal fc2 gemm.

    Motivation was the op-count/latency-bound post-encode tail
    (benchmarks/profile_step.py) — but the fusion MEASURED SLOWER on the
    real chip at the production shape (959-995us/step vs 910-923 unfused,
    B=256/T=354, r3): the fused fc1 computes every head's columns for every
    head's rows, and those off-segment garbage FLOPs plus the row-concat
    copies cost more than the collapsed op count saves. Kept as a tested
    `Config.fused_heads` option (OFF by default) and as the measured record.
    Correctness of the garbage blocks: they are finite, (a) normalized by
    the OWNING head's stats, (b) multiplied by the exact ZERO blocks of the
    block-diagonal fc2 — adding 0.0 terms, bit-preserving — and (c) sliced
    away.

    Per-head BN statistics stay per-head: a static (n_heads, N) row-segment
    indicator matmul computes each head's column-block sums restricted to
    its own rows (one MXU op instead of 2*n_heads VPU reductions), then
    `var = mean(square(x - mean))` exactly like `batchnorm_apply` (same
    formula, matmul reduction order — f32 drift ~1e-7). Under a data mesh
    the rows are batch-sharded and the indicator contraction psums — the
    same global-batch BN semantics as the unfused path.

    `heads`: list of dicts `{"params", "state", "x", "relu"}` with a shared
    input width. `key`: ONE dropout key for the whole fused plane (the
    unfused path draws per head; dropout patterns carry no parity contract).
    Returns `(ys, new_states)` aligned with `heads`.
    """
    import numpy as np

    n_heads = len(heads)
    xs = [h["x"] for h in heads]
    rows = [x.shape[0] for x in xs]
    hids = [h["params"]["fc1"]["w"].shape[0] for h in heads]
    outs = [h["params"]["fc2"]["w"].shape[0] for h in heads]
    row_off = np.concatenate([[0], np.cumsum(rows)])
    col_off = np.concatenate([[0], np.cumsum(hids)])
    ocol_off = np.concatenate([[0], np.cumsum(outs)])
    n_rows, n_cols, n_outs = int(row_off[-1]), int(col_off[-1]), int(ocol_off[-1])

    x_cat = jnp.concatenate(xs, axis=0)  # (N, in)
    w1 = jnp.concatenate([h["params"]["fc1"]["w"] for h in heads], axis=0)
    b1 = jnp.concatenate([h["params"]["fc1"]["b"] for h in heads])
    hid = x_cat @ w1.T + b1  # (N, HS)

    if train:
        seg = np.zeros((n_heads, n_rows), np.float32)
        for i in range(n_heads):
            seg[i, row_off[i]:row_off[i + 1]] = 1.0
        seg = jnp.asarray(seg)
        # optional per-head row masks (padded-tail batches): fold them into
        # the segment indicator so each head's moments sum only its REAL
        # rows, and divide by the masked row count — the same mask-weighted
        # moments as `batchnorm_apply(row_mask=...)`
        masks = [h.get("row_mask") for h in heads]
        if any(m is not None for m in masks):
            mask_cat = jnp.concatenate([
                m if m is not None else jnp.ones((rows[i],), hid.dtype)
                for i, m in enumerate(masks)
            ])
            seg = seg * mask_cat[None, :]
            counts = [
                jnp.sum(m) if m is not None else float(rows[i])
                for i, m in enumerate(masks)
            ]
        else:
            counts = [float(r) for r in rows]
        sums = seg @ hid  # (n_heads, HS) row-segment column sums
        mean_blocks = [
            sums[i, col_off[i]:col_off[i + 1]] / counts[i] for i in range(n_heads)
        ]
        mean_vec = jnp.concatenate(mean_blocks)
        sq = seg @ jnp.square(hid - mean_vec)
        var_blocks = [
            sq[i, col_off[i]:col_off[i + 1]] / counts[i] for i in range(n_heads)
        ]
        var_vec = jnp.concatenate(var_blocks)
        new_states = []
        for i, h in enumerate(heads):
            n = counts[i]
            factor = (n / max(n - 1.0, 1.0)) if isinstance(n, float) \
                else (n / jnp.maximum(n - 1.0, 1.0))
            unbiased = var_blocks[i] * factor
            st = h["state"]["bn"]
            new_states.append({"bn": {
                "mean": (1 - BN_MOMENTUM) * st["mean"] + BN_MOMENTUM * mean_blocks[i],
                "var": (1 - BN_MOMENTUM) * st["var"] + BN_MOMENTUM * unbiased,
            }})
    else:
        mean_vec = jnp.concatenate([h["state"]["bn"]["mean"] for h in heads])
        var_vec = jnp.concatenate([h["state"]["bn"]["var"] for h in heads])
        new_states = [{"bn": dict(h["state"]["bn"])} for h in heads]

    gamma = jnp.concatenate([h["params"]["bn"]["gamma"] for h in heads])
    beta = jnp.concatenate([h["params"]["bn"]["beta"] for h in heads])
    y = (hid - mean_vec) * jax.lax.rsqrt(var_vec + BN_EPS) * gamma + beta

    if any(h["relu"] for h in heads):
        relu_cols = np.zeros((n_cols,), bool)
        for i, h in enumerate(heads):
            if h["relu"]:
                relu_cols[col_off[i]:col_off[i + 1]] = True
        y = jnp.where(jnp.asarray(relu_cols), jnp.maximum(y, 0.0), y)

    y = dropout(key, y, rate, train)

    # block-diagonal fc2: off-diagonal zeros multiply the off-segment
    # garbage exactly to 0.0 (all garbage is finite), so each head's output
    # block equals its standalone fc2 up to gemm tiling
    w2 = jnp.zeros((n_cols, n_outs), heads[0]["params"]["fc2"]["w"].dtype)
    for i, h in enumerate(heads):
        w2 = jax.lax.dynamic_update_slice(
            w2, h["params"]["fc2"]["w"].T, (int(col_off[i]), int(ocol_off[i]))
        )
    b2 = jnp.concatenate([h["params"]["fc2"]["b"] for h in heads])
    out = y @ w2 + b2  # (N, OS)

    ys = [
        out[row_off[i]:row_off[i + 1], ocol_off[i]:ocol_off[i + 1]]
        for i in range(n_heads)
    ]
    return ys, new_states
