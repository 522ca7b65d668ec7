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


def bilstm_forward(
    params: Dict,
    x: Array,
    h0: Optional[Array] = None,
    c0: Optional[Array] = None,
    use_pallas: bool = False,
) -> Tuple[Array, Array, Array]:
    """Run a 1-layer biLSTM over time-major `x: (T, B, F)`.

    Returns `(output (T, B, 2H), hidden (2, B, H), cell (2, B, H))` in
    torch's layout: output concatenates [fwd, bwd] features per step (the
    bwd stream time-aligned, i.e. reversed back), and hidden/cell stack the
    final state of each direction (fwd at index 0, bwd at index 1).

    Both directions run in ONE scan: the backward stream's precomputed
    input gates are time-flipped so a single forward scan advances fwd and
    bwd together, with the recurrent projection as one batched (2,B,H) @
    (2,H,4H) einsum — halving the sequential op count of the recurrent
    chain (the step is latency-bound: R=6 tiny gemms dominate by per-op
    overhead, not FLOPs). The input projections stay hoisted as two big
    parallel matmuls, and the gate addition order (x·W_ih + b_ih first,
    recurrent after) is unchanged, keeping torch gate numerics.
    """
    t_len, b_sz, _ = x.shape
    hidden = params["fwd"]["w_hh"].shape[1]
    zeros = jnp.zeros((b_sz, hidden), x.dtype)
    h0_f, h0_b = (zeros, zeros) if h0 is None else (h0[0], h0[1])
    c0_f, c0_b = (zeros, zeros) if c0 is None else (c0[0], c0[1])

    xg_f = x @ params["fwd"]["w_ih"].T + params["fwd"]["b_ih"]  # (T, B, 4H)
    xg_b = x @ params["bwd"]["w_ih"].T + params["bwd"]["b_ih"]

    if use_pallas:
        # fused Mosaic recurrence (ops/pallas_lstm.py): weights stay VMEM-
        # resident across the whole T-step chain, the bwd stream indexes
        # time directly (no flip/stack relayouts), and the hand-written
        # backward kernel replaces XLA's unrolled reverse scan.
        # The kernel pair is f32-only (gate math and the hand-written VJP
        # both accumulate/emit f32): under compute_dtype='bfloat16' the
        # recurrence upcasts at this boundary and casts back, so the
        # custom_vjp's primal/cotangent dtypes stay consistent
        from .pallas_lstm import bilstm_recurrence_pallas

        in_dtype = x.dtype
        f32 = jnp.float32
        w_hhT = jnp.stack(
            [params["fwd"]["w_hh"].T, params["bwd"]["w_hh"].T]
        ).astype(f32)  # (2, H, 4H)
        b_hh2 = jnp.stack(
            [params["fwd"]["b_hh"], params["bwd"]["b_hh"]]
        ).astype(f32)
        ysf, ysb, csf, csb = bilstm_recurrence_pallas(
            xg_f.astype(f32), xg_b.astype(f32), w_hhT, b_hh2,
            jnp.stack([h0_f, h0_b]).astype(f32),
            jnp.stack([c0_f, c0_b]).astype(f32),
        )
        output = jnp.concatenate([ysf, ysb], axis=-1).astype(in_dtype)
        h_t = jnp.stack([ysf[-1], ysb[0]]).astype(in_dtype)  # final states
        c_t = jnp.stack([csf[-1], csb[0]]).astype(in_dtype)
        return output, h_t, c_t

    xg = jnp.stack([xg_f, jnp.flip(xg_b, axis=0)], axis=1)  # (T, 2, B, 4H)
    w_hh = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]])  # (2, 4H, H)
    b_hh = jnp.stack([params["fwd"]["b_hh"], params["bwd"]["b_hh"]])  # (2, 4H)

    def step(carry, xg_t):
        h, c = carry  # (2, B, H) each
        gates = xg_t + jnp.einsum("dbh,dgh->dbg", h, w_hh) + b_hh[:, None, :]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (h_t, c_t), ys = jax.lax.scan(
        step,
        (jnp.stack([h0_f, h0_b]), jnp.stack([c0_f, c0_b])),
        xg,
        unroll=min(t_len, 8),
    )
    # ys[:, 1, ...] holds the bwd stream in reversed time; flip back to
    # torch's time-aligned bidirectional output layout
    output = jnp.concatenate([ys[:, 0], jnp.flip(ys[:, 1], axis=0)], axis=-1)
    return output, h_t, c_t
