"""Fused Pallas TPU kernel for the biLSTM recurrence.

The encoder/decoder biLSTMs run only R=6 steps, but the XLA scan pays per
step for both directions: a batched (2,B,H)@(2,H,4H) matmul, the gate
nonlinearity chain, and the relayout of the stacked gate planes — measured
172 us/step combined (fwd+bwd, B=256 production shape, source-attributed
trace in PARITY.md), the largest single subsystem of the fused train step.
This kernel runs the WHOLE recurrence (all steps, both directions) in one
Mosaic program per batch tile: the (H, 4H) recurrent weights stay resident
in VMEM, each step is one MXU dot + VPU gates per direction, and the
backward kernel walks the steps in reverse in the same fashion,
recomputing gates from the saved per-step states and accumulating the
weight gradients across batch tiles in its output refs.

Interface contract (matches ops/lstm.bilstm_forward's merged-direction
scan exactly in math):
  * inputs are the PRE-PROJECTED gates xg_d = x @ W_ih_d^T + b_ih_d per
    direction, time-major (T, B, 4H), the backward direction's UNFLIPPED —
    the kernel indexes time t_len-1-s directly, so the jnp path's
    flip/stack/relayout ops disappear;
  * gate order [i|f|g|o] along 4H (torch packing, ops/lstm.py);
  * gate math `(xg + h @ W_hh^T) + b_hh` in the same association order;
  * outputs are time-ALIGNED per direction (the bwd stream is written
    back-to-front), so `ys_b[t]` corresponds to original time t.

Numerics: in-kernel dots inherit the ambient `default_matmul_precision`
(same as the scan path's einsum). On TPU, Mosaic's sigmoid/tanh differ
from XLA's by O(1e-7) per step, so this path is OFF on the 1e-5 parity
surface and opt-in via `Config.use_pallas_lstm` (measured + gated like
`use_pallas`); in interpreter mode (CPU tests) the kernel math is the jnp
math and agreement is exact to f32 rounding.

Reference: the recurrence being fused is nn.LSTM in
pretrain_interp.py:14-41 (torch gate order and layout notes in
ops/lstm.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gate_slices(h: int):
    return (
        slice(0, h),  # i
        slice(h, 2 * h),  # f
        slice(2 * h, 3 * h),  # g
        slice(3 * h, 4 * h),  # o
    )


# Mosaic lowers only DEFAULT/HIGHEST dot precisions; the ambient
# default_matmul_precision("high") would otherwise leak into the kernel
# trace. HIGHEST = full-f32 MXU passes — slightly more accurate than the
# scan path's bf16_3x einsum and a non-factor for speed here (the R-step
# chain is latency-bound, not MXU-bound).
_DOT_PREC = jax.lax.Precision.HIGHEST


def _step(gates: Array, c_prev: Array, h: int) -> Tuple[Array, Array]:
    si, sf, sg, so = _gate_slices(h)
    i = jax.nn.sigmoid(gates[:, si])
    f = jax.nn.sigmoid(gates[:, sf])
    g = jnp.tanh(gates[:, sg])
    o = jax.nn.sigmoid(gates[:, so])
    c_new = f * c_prev + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


# ----------------------------------------------------------------- fwd
def _fwd_kernel(
    xgf_ref, xgb_ref, whhT_ref, bhh_ref, h0_ref, c0_ref,
    ysf_ref, ysb_ref, csf_ref, csb_ref, *, t_len, hidden,
):
    w_f = whhT_ref[0]  # (H, 4H)
    w_b = whhT_ref[1]
    b_f = bhh_ref[0]  # (1, 4H)
    b_b = bhh_ref[1]
    hf, hb = h0_ref[0], h0_ref[1]  # (TILE, H)
    cf, cb = c0_ref[0], c0_ref[1]
    for t in range(t_len):
        gf = (xgf_ref[t] + jnp.dot(hf, w_f, precision=_DOT_PREC, preferred_element_type=jnp.float32)) + b_f
        gb = (
            xgb_ref[t_len - 1 - t]
            + jnp.dot(hb, w_b, precision=_DOT_PREC, preferred_element_type=jnp.float32)
        ) + b_b
        hf, cf = _step(gf, cf, hidden)
        hb, cb = _step(gb, cb, hidden)
        ysf_ref[t], csf_ref[t] = hf, cf
        ysb_ref[t_len - 1 - t], csb_ref[t_len - 1 - t] = hb, cb


# ----------------------------------------------------------------- bwd
def _bwd_kernel(
    xgf_ref, xgb_ref, whhT_ref, whh_ref, bhh_ref, h0_ref, c0_ref,
    ysf_ref, ysb_ref, csf_ref, csb_ref,
    dysf_ref, dysb_ref, dcsf_ref, dcsb_ref,
    dxgf_ref, dxgb_ref, dwhhT_ref, dbhh_ref, dh0_ref, dc0_ref,
    *, t_len, hidden,
):
    """Reverse walk over both directions, recomputing gates from the saved
    states. The h/c carries start at zero and absorb `dys[t]`/`dcs[t]` at
    every step, so cotangents on ANY output entry (interior h/c included —
    the final states are just slices of ys/cs) are handled uniformly.
    Weight/bias grads accumulate across the sequential grid (batch tiles)
    in their output refs."""
    contract_rows = (((0,), (0,)), ((), ()))  # (TILE,H)x(TILE,4H) -> (H,4H)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwhhT_ref[...] = jnp.zeros_like(dwhhT_ref)
        dbhh_ref[...] = jnp.zeros_like(dbhh_ref)

    for d in range(2):
        w_T = whhT_ref[d]  # (H, 4H) — recompute direction
        w = whh_ref[d]  # (4H, H) — pull dh back through the gates
        b = bhh_ref[d]  # (1, 4H)
        # original-time index of this direction's s-th processed step
        tau = (lambda s: s) if d == 0 else (lambda s: t_len - 1 - s)
        xg_ref = xgf_ref if d == 0 else xgb_ref
        ys_ref = ysf_ref if d == 0 else ysb_ref
        cs_ref = csf_ref if d == 0 else csb_ref
        dys_ref = dysf_ref if d == 0 else dysb_ref
        dcs_ref = dcsf_ref if d == 0 else dcsb_ref
        dxg_ref = dxgf_ref if d == 0 else dxgb_ref

        dh = jnp.zeros((ysf_ref.shape[1], hidden), jnp.float32)
        dc = jnp.zeros_like(dh)
        dw_acc = jnp.zeros((hidden, 4 * hidden), jnp.float32)
        db_acc = jnp.zeros((1, 4 * hidden), jnp.float32)
        si, sf_, sg, so = _gate_slices(hidden)
        for s in range(t_len - 1, -1, -1):
            t = tau(s)
            t_prev = tau(s - 1)
            if s > 0:
                h_prev = ys_ref[t_prev]
                c_prev = cs_ref[t_prev]
            else:
                h_prev = h0_ref[d]
                c_prev = c0_ref[d]
            gates = (
                xg_ref[t] + jnp.dot(h_prev, w_T, precision=_DOT_PREC, preferred_element_type=jnp.float32)
            ) + b
            i = jax.nn.sigmoid(gates[:, si])
            f = jax.nn.sigmoid(gates[:, sf_])
            g = jnp.tanh(gates[:, sg])
            o = jax.nn.sigmoid(gates[:, so])
            c_t = cs_ref[t]
            tc = jnp.tanh(c_t)

            dh = dh + dys_ref[t]
            dc = dc + dcs_ref[t]
            do = dh * tc
            dc = dc + dh * o * (1.0 - tc * tc)
            di = dc * g
            df = dc * c_prev
            dg = dc * i
            dpre = jnp.concatenate(
                [
                    di * i * (1.0 - i),
                    df * f * (1.0 - f),
                    dg * (1.0 - g * g),
                    do * o * (1.0 - o),
                ],
                axis=1,
            )  # (TILE, 4H)
            dxg_ref[t] = dpre
            dh = jnp.dot(dpre, w, precision=_DOT_PREC, preferred_element_type=jnp.float32)  # (TILE, H)
            dc = dc * f
            dw_acc = dw_acc + jax.lax.dot_general(
                h_prev, dpre, contract_rows, precision=_DOT_PREC,
                preferred_element_type=jnp.float32,
            )
            db_acc = db_acc + jnp.sum(dpre, axis=0, keepdims=True)
        dh0_ref[d] = dh
        dc0_ref[d] = dc
        dwhhT_ref[d] += dw_acc
        dbhh_ref[d] += db_acc


# ------------------------------------------------------------- plumbing
def _pick_tile(b: int, t_len: int, hidden: int, n_gate: int, n_state: int) -> int:
    """Batch rows per grid tile: exact accounting of the (t_len, TILE, 4H)
    gate buffers and (t_len, TILE, H) state buffers against a ~12 MB VMEM
    budget (16 MB/core minus weights, carries, and Mosaic temporaries)."""
    # Mosaic's stack accounting keeps the unrolled steps' gate temporaries
    # live alongside the block inputs/outputs, so the budget must leave
    # room for ~2x the per-step working set (measured: 12 MB OOMs at 8.9 MB
    # over the 16 MB scoped limit; 4 MB compiles with headroom)
    budget = 4 * 1024 * 1024
    per_row = t_len * 4 * hidden * (4 * n_gate + n_state)  # bytes/batch row
    tile = max(8, min(_round_up(b, 8), (budget // per_row) // 8 * 8))
    return tile


def _common_specs(t_len, tile, hidden):
    gates = pl.BlockSpec(
        (t_len, tile, 4 * hidden), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    states = pl.BlockSpec(
        (t_len, tile, hidden), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    dirs = pl.BlockSpec(
        (2, tile, hidden), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    w_T = pl.BlockSpec(
        (2, hidden, 4 * hidden), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    w = pl.BlockSpec(
        (2, 4 * hidden, hidden), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    bias = pl.BlockSpec((2, 1, 4 * hidden), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    return gates, states, dirs, w_T, w, bias


def _pad_b(a: Array, b_pad: int, axis: int) -> Array:
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, b_pad - a.shape[axis])
    return jnp.pad(a, pad)


def _recurrence_fwd_raw(xgf, xgb, w_hhT, b_hh, h0, c0):
    t_len, b, four_h = xgf.shape
    hidden = four_h // 4
    tile = _pick_tile(b, t_len, hidden, n_gate=2, n_state=4)
    b_pad = _round_up(b, tile)
    xgf_p = _pad_b(xgf, b_pad, 1)
    xgb_p = _pad_b(xgb, b_pad, 1)
    h0_p = _pad_b(h0, b_pad, 1)
    c0_p = _pad_b(c0, b_pad, 1)
    gates, states, dirs, w_T, _, bias = _common_specs(t_len, tile, hidden)
    shape = jax.ShapeDtypeStruct((t_len, b_pad, hidden), xgf.dtype)
    ysf, ysb, csf, csb = pl.pallas_call(
        functools.partial(_fwd_kernel, t_len=t_len, hidden=hidden),
        grid=(b_pad // tile,),
        in_specs=[gates, gates, w_T, bias, dirs, dirs],
        out_specs=(states, states, states, states),
        out_shape=(shape,) * 4,
        interpret=_interpret(),
    )(xgf_p, xgb_p, w_hhT, b_hh[:, None, :], h0_p, c0_p)
    trim = lambda a: a[:, :b]
    return trim(ysf), trim(ysb), trim(csf), trim(csb)


@jax.custom_vjp
def bilstm_recurrence_pallas(xgf, xgb, w_hhT, b_hh, h0, c0):
    """Run the merged two-direction LSTM recurrence.

    Args: `xgf`/`xgb` (T, B, 4H) pre-projected input gates (bwd direction
    unflipped), `w_hhT` (2, H, 4H), `b_hh` (2, 4H), `h0`/`c0` (2, B, H).
    Returns `(ys_f, ys_b, cs_f, cs_b)`, each (T, B, H) time-aligned.
    """
    return _recurrence_fwd_raw(xgf, xgb, w_hhT, b_hh, h0, c0)


def _vjp_fwd(xgf, xgb, w_hhT, b_hh, h0, c0):
    out = _recurrence_fwd_raw(xgf, xgb, w_hhT, b_hh, h0, c0)
    return out, (xgf, xgb, w_hhT, b_hh, h0, c0, *out)


def _vjp_bwd(res, cots):
    xgf, xgb, w_hhT, b_hh, h0, c0, ysf, ysb, csf, csb = res
    dysf, dysb, dcsf, dcsb = cots
    t_len, b, four_h = xgf.shape
    hidden = four_h // 4

    tile = _pick_tile(b, t_len, hidden, n_gate=4, n_state=8)
    b_pad = _round_up(b, tile)
    pads = [
        _pad_b(a, b_pad, 1)
        for a in (xgf, xgb, ysf, ysb, csf, csb, dysf, dysb, dcsf, dcsb)
    ]
    (
        xgf_p, xgb_p, ysf_p, ysb_p, csf_p, csb_p,
        dysf_p, dysb_p, dcsf_p, dcsb_p,
    ) = pads
    h0_p = _pad_b(h0, b_pad, 1)
    c0_p = _pad_b(c0, b_pad, 1)

    gates, states, dirs, w_T, w, bias = _common_specs(t_len, tile, hidden)
    acc_w = pl.BlockSpec(
        (2, hidden, 4 * hidden), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    acc_b = pl.BlockSpec((2, 1, 4 * hidden), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((t_len, b_pad, 4 * hidden), f32),  # dxgf
        jax.ShapeDtypeStruct((t_len, b_pad, 4 * hidden), f32),  # dxgb
        jax.ShapeDtypeStruct((2, hidden, 4 * hidden), f32),  # dw_hhT
        jax.ShapeDtypeStruct((2, 1, 4 * hidden), f32),  # db_hh
        jax.ShapeDtypeStruct((2, b_pad, hidden), f32),  # dh0
        jax.ShapeDtypeStruct((2, b_pad, hidden), f32),  # dc0
    )
    w_hh = jnp.transpose(w_hhT, (0, 2, 1))
    dxgf, dxgb, dw_hhT, db_hh, dh0, dc0 = pl.pallas_call(
        functools.partial(_bwd_kernel, t_len=t_len, hidden=hidden),
        grid=(b_pad // tile,),
        in_specs=[
            gates, gates, w_T, w, bias, dirs, dirs,
            states, states, states, states,
            states, states, states, states,
        ],
        out_specs=(gates, gates, acc_w, acc_b, dirs, dirs),
        out_shape=out_shapes,
        interpret=_interpret(),
    )(
        xgf_p, xgb_p, w_hhT, w_hh, b_hh[:, None, :], h0_p, c0_p,
        ysf_p, ysb_p, csf_p, csb_p,
        dysf_p, dysb_p, dcsf_p, dcsb_p,
    )
    trim = lambda a: a[:, :b]
    return (
        trim(dxgf), trim(dxgb), dw_hhT, db_hh[:, 0, :], trim(dh0), trim(dc0)
    )


bilstm_recurrence_pallas.defvjp(_vjp_fwd, _vjp_bwd)
