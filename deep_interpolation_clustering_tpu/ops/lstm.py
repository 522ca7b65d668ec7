"""Bidirectional LSTM via `jax.lax.scan`.

The encoder/decoder are 1-layer biLSTMs over only R=6 reference points
(reference pretrain_interp.py:14-41, nn.LSTM). Weight packing and gate order
follow torch (`w_ih: (4H, in)` rows packed [i|f|g|o]) so torch checkpoints map
directly into the pytree; the scan is unrolled (R is tiny) so XLA emits
straight-line MXU matmuls instead of a loop.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _direction_init(key: Array, input_size: int, hidden: int, dtype) -> Dict:
    """torch nn.LSTM default init: all weights/biases U(-1/sqrt(H), 1/sqrt(H))."""
    bound = 1.0 / jnp.sqrt(hidden)
    ks = jax.random.split(key, 4)
    return {
        "w_ih": jax.random.uniform(ks[0], (4 * hidden, input_size), dtype, -bound, bound),
        "w_hh": jax.random.uniform(ks[1], (4 * hidden, hidden), dtype, -bound, bound),
        "b_ih": jax.random.uniform(ks[2], (4 * hidden,), dtype, -bound, bound),
        "b_hh": jax.random.uniform(ks[3], (4 * hidden,), dtype, -bound, bound),
    }


def lstm_init(key: Array, input_size: int, hidden: int, dtype=jnp.float32) -> Dict:
    kf, kb = jax.random.split(key)
    return {
        "fwd": _direction_init(kf, input_size, hidden, dtype),
        "bwd": _direction_init(kb, input_size, hidden, dtype),
    }


def _cell(p: Dict, h: Array, c: Array, x_gates: Array) -> Tuple[Array, Array]:
    """One LSTM step; torch gate order [i|f|g|o]. `x_gates` is the
    precomputed input projection `x_t @ w_ih.T + b_ih` for this step."""
    gates = x_gates + h @ p["w_hh"].T + p["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _scan_direction(
    p: Dict, xs: Array, h0: Array, c0: Array, reverse: bool
) -> Tuple[Array, Array, Array]:
    # hoist the input projection out of the sequential chain: ONE parallel
    # (T*B, in)@(in, 4H) matmul instead of T serial ones; the scan keeps
    # only the recurrent h @ w_hh. Addition order matches the fused form
    # (x w_ih + b_ih first, recurrent terms after), so results are
    # bit-identical to torch's gate computation.
    x_gates = xs @ p["w_ih"].T + p["b_ih"]  # (T, B, 4H)

    def step(carry, xg):
        h, c = carry
        h, c = _cell(p, h, c, xg)
        return (h, c), h

    (h_T, c_T), ys = jax.lax.scan(
        step, (h0, c0), x_gates, reverse=reverse, unroll=min(xs.shape[0], 8)
    )
    return ys, h_T, c_T


def bilstm_forward(
    params: Dict,
    x: Array,
    h0: Optional[Array] = None,
    c0: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """Run a 1-layer biLSTM over time-major `x: (T, B, F)`.

    Returns `(output (T, B, 2H), hidden (2, B, H), cell (2, B, H))` in
    torch's layout: output concatenates [fwd, bwd] features per step (the
    bwd stream time-aligned, i.e. reversed back), and hidden/cell stack the
    final state of each direction (fwd at index 0, bwd at index 1).
    """
    _, b_sz, _ = x.shape
    hidden = params["fwd"]["w_hh"].shape[1]
    zeros = jnp.zeros((b_sz, hidden), x.dtype)
    h0_f, h0_b = (zeros, zeros) if h0 is None else (h0[0], h0[1])
    c0_f, c0_b = (zeros, zeros) if c0 is None else (c0[0], c0[1])

    ys_f, h_f, c_f = _scan_direction(params["fwd"], x, h0_f, c0_f, reverse=False)
    # lax.scan(reverse=True) consumes xs back-to-front and stacks outputs
    # time-aligned, which is exactly torch's bidirectional output layout.
    ys_b, h_b, c_b = _scan_direction(params["bwd"], x, h0_b, c0_b, reverse=True)

    output = jnp.concatenate([ys_f, ys_b], axis=-1)
    hidden_out = jnp.stack([h_f, h_b], axis=0)
    cell_out = jnp.stack([c_f, c_b], axis=0)
    return output, hidden_out, cell_out
