"""Per-stage decomposition of the on-chip parity residue.

`bench.py` machine-checks the full forward against the committed torch
fixture every round: the chip reads ~5.7e-4 on the latent while the host-CPU
backend holds 2.6e-6 vs torch — so the residue is chip-vs-CPU numerics, not
the rebuild's. This instrument pins WHERE it enters: each stage of the
forward (SCI -> CCI -> encoder -> decoder -> compress head -> RBF push) runs
on the real chip and on the in-process CPU backend, twice per stage:

  * isolated  — the stage consumes the CPU-computed value of its own input,
                so the diff is what THIS stage's chip execution injects;
  * cumulative — the stage consumes the chip chain's value, so the diff
                shows how earlier injections amplify downstream.

Run on the real TPU from /root/repo: `python benchmarks/parity_ledger.py`
[--precision high|highest] [--mitigate]. `--mitigate` additionally evaluates
candidate numerical variants of the top-contributing stage (r4 verdict item:
compensated/pairwise T-summation in SCI, f64 logsumexp shadowing, exp
argument analysis) and prints their isolated-injection numbers side by side.

Uses the same committed fixture as bench.py (tests/fixtures/onchip_parity.npz,
B=32/C=6/T=354/R=6 — benchmarks/make_parity_fixture.py).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.ops.interpolation import (
    cci_forward,
    sci_forward,
)
from deep_interpolation_clustering_tpu.ops.lstm import bilstm_forward
from deep_interpolation_clustering_tpu.ops import nn as dnn
from deep_interpolation_clustering_tpu.ops.rbf import rbf_push
from deep_interpolation_clustering_tpu.train.checkpoint import _unflatten_nested

FIXTURE = os.path.join(_REPO, "tests", "fixtures", "onchip_parity.npz")


def load_fixture():
    with np.load(FIXTURE) as z:
        arrays = {k: z[k] for k in z.files}
    params = _unflatten_nested(
        {k[len("params/"):]: v for k, v in arrays.items() if k.startswith("params/")}
    )
    state = _unflatten_nested(
        {k[len("state/"):]: v for k, v in arrays.items() if k.startswith("state/")}
    )
    return params, state, arrays


def make_stages(params, state, cfg: Config, precision: str):
    """Ordered (name, jitted_fn, input_builder) stage list. Each fn maps the
    previous stage's output to this stage's output; stage 0 consumes the
    stacked fixture input."""

    def wrap(f):
        def g(*a):
            with jax.default_matmul_precision(precision):
                return f(*a)
        return jax.jit(g)

    R, H = cfg.ref_points, cfg.hours_from_admission

    def s_sci(x):
        return sci_forward(params["sci"]["kernel"], x, R, H)

    def s_cci(rep):
        return cci_forward(params["cci"]["kernel"], rep)

    def s_enc(rep):
        enc_out, hidden, cell = bilstm_forward(
            params["encoder"], jnp.transpose(rep, (1, 0, 2))
        )
        cat_hidden = jnp.concatenate([hidden[0], hidden[1]], axis=-1)
        return enc_out, hidden, cell, cat_hidden

    def s_dec(enc):
        enc_out, hidden, cell, _ = enc
        dec_out, _, _ = bilstm_forward(
            params["decoder"], jax.nn.relu(enc_out), hidden, cell
        )
        return jnp.transpose(dec_out, (1, 0, 2))  # (B, R, 2H)

    def s_head(interp_data):
        b, r, d = interp_data.shape
        y, _ = dnn.head_apply(
            params["rbf"]["compress"], state["rbf"]["compress"],
            interp_data.reshape(b * r, d), 0.0, train=False, key=None, relu=True,
        )
        c = y.shape[-1]
        return jnp.transpose(y.reshape(b, r, c), (0, 2, 1))  # (B, C, R)

    return [
        ("sci", wrap(s_sci)),
        ("cci", wrap(s_cci)),
        ("encoder", wrap(s_enc)),
        ("decoder", wrap(s_dec)),
        ("compress", wrap(s_head)),
        ("rbf_push", None),  # built per-call: needs the original x too
    ]


def tree_max_abs(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - np.asarray(y, np.float32))))
        for x, y in zip(la, lb)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="high",
                    choices=("high", "highest", "default"))
    ap.add_argument("--mitigate", action="store_true")
    args = ap.parse_args()

    params, state, arrays = load_fixture()
    cfg = Config(fake_detection=False, aux_tasks={})
    x = jnp.asarray(arrays["x"])

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print(f"device: {dev.platform}/{dev.device_kind}; precision={args.precision}")
    if dev.platform == "cpu":
        print("WARNING: no accelerator visible — both columns run on CPU")

    stages = make_stages(params, state, cfg, args.precision)

    def rbf_fn(proj, xx):
        with jax.default_matmul_precision(args.precision):
            return rbf_push(
                params["rbf"]["kernel"], proj, xx, cfg.ref_points,
                cfg.hours_from_admission, cfg.rbf_basis,
            )

    rbf_jit = jax.jit(rbf_fn)

    def run_chain(device):
        outs = []
        cur = x
        for name, fn in stages:
            cur = jax.tree_util.tree_map(jnp.asarray, cur)
            if name == "rbf_push":
                cur = rbf_jit(jax.device_put(cur, device),
                              jax.device_put(x, device))
            else:
                cur = fn(jax.device_put(cur, device))
            cur = jax.device_get(cur)
            outs.append((name, cur))
        return outs

    # CPU golden chain (agrees with torch to 2.6e-6 at this shape)
    cpu_chain = run_chain(cpu)
    cpu_by_name = dict(cpu_chain)

    # chip cumulative chain
    dev_chain = run_chain(dev)

    # chip isolated: each stage fed the CPU value of its input
    print(f"\n{'stage':<10} {'isolated':>12} {'cumulative':>12}   (max |chip - cpu|)")
    for i, (name, fn) in enumerate(stages):
        inp = x if i == 0 else cpu_by_name[stages[i - 1][0]]
        inp = jax.tree_util.tree_map(jnp.asarray, inp)
        if name == "rbf_push":
            iso = rbf_jit(jax.device_put(inp, dev), jax.device_put(x, dev))
        else:
            iso = fn(jax.device_put(inp, dev))
        iso_d = tree_max_abs(
            jax.tree_util.tree_map(jnp.asarray, jax.device_get(iso)),
            cpu_by_name[name],
        )
        cum_d = tree_max_abs(
            jax.tree_util.tree_map(jnp.asarray, dev_chain[i][1]),
            cpu_by_name[name],
        )
        print(f"{name:<10} {iso_d:>12.3e} {cum_d:>12.3e}")

    # end-to-end anchors (same definition as bench.py's onchip_parity)
    hid_dev = dev_chain[2][1][3]
    hid_cpu = cpu_by_name["encoder"][3]
    print(f"\nlatent cumulative (bench 'hidden'): "
          f"{float(np.max(np.abs(hid_dev - hid_cpu))):.3e}")
    print(f"latent vs torch: "
          f"{float(np.max(np.abs(hid_dev - arrays['torch_hidden']))):.3e}")

    if args.mitigate:
        mitigate_sci(params, cfg, x, cpu_by_name, dev, args.precision)


def mitigate_sci(params, cfg, x, cpu_by_name, dev, precision):
    """Candidate numerical variants of the SCI stage, each measured on the
    chip against the CPU golden SCI output (isolated injection)."""
    from deep_interpolation_clustering_tpu.ops import interpolation as interp

    R, H = cfg.ref_points, cfg.hours_from_admission
    kernel = params["sci"]["kernel"]
    golden = cpu_by_name["sci"]

    def measure(name, fn):
        out = jax.jit(fn)(jax.device_put(kernel, dev), jax.device_put(x, dev))
        d = float(np.max(np.abs(np.asarray(out) - golden)))
        print(f"  {name:<28} {d:.3e}")

    def sci_raw(kernel, x, r, hours):
        """The pre-r4 SCI path: platform log1p/logsumexp, no Newton
        refinement — kept as the committed reproducer of the chip-log
        residue (measured 5.7e-4 on the latent before ops/numerics.py)."""
        x_t, mask, t_obs, _ = interp.to_planes(x, kernel.shape[0])
        ref_t = interp.reference_times(r, hours, x_t.dtype)
        diff = t_obs[..., None] - ref_t
        norm = diff * diff
        alpha = jnp.log1p(jnp.exp(kernel))
        log_mask = jnp.log(mask)
        logits = -alpha[None, :, None, None] * norm + log_mask[..., None]
        w = jax.nn.logsumexp(logits, axis=2)
        y = jnp.sum(jnp.exp(logits - w[:, :, None, :]) * x_t[..., None], axis=2)
        logits_t = interp.TRANSIENT_KAPPA * (
            -alpha[None, :, None, None] * norm) + log_mask[..., None]
        w_t = jax.nn.logsumexp(logits_t, axis=2)
        y_t = jnp.sum(jnp.exp(logits_t - w_t[:, :, None, :]) * x_t[..., None],
                      axis=2)
        return jnp.transpose(jnp.concatenate([y, w, y_t], axis=1), (0, 2, 1))

    print("\nSCI variants (isolated max |chip - cpu golden|):")
    with jax.default_matmul_precision(precision):
        measure("raw log1p/logsumexp (pre-r4)",
                lambda k, xx: sci_raw(k, xx, R, H))
        measure("Newton-refined (production)",
                lambda k, xx: interp.sci_forward(k, xx, R, H))


if __name__ == "__main__":
    main()
