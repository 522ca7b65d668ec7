"""Cost attribution of the production fused-epoch step (VERDICT r2 #2).

Two complementary views, both on the real chip at B=256/T=354:

* `--mode ablate` (default) — differential profiling of the REAL
  `make_train_epoch` program: time the full step, then re-time with one
  feature removed per run (fake stream, aux head, dropout, optimizer,
  backward). The deltas attribute wall-clock to features with production
  fidelity — no micro-harness artifacts, because the per-step batch gather
  keeps every iteration's compute live (nothing is loop-invariant).

* `--mode micro` — isolated subgraph timings (SCI, RBF, LSTMs, fake
  select) in an N-iteration `lax.scan`. CAVEAT: inputs are fixed, so any
  key-independent segment is loop-invariant and XLA hoists it; every body
  therefore threads the key into a small input (`jitter`, value-preserving
  +1e-38). Still an UNDER-estimate whenever XLA would fuse a subgraph with
  its neighbors in the full program; use for ratios, not absolutes.

History: the r3 micro profile measured full_update=337us while the real
fused-epoch step runs ~700us ('highest') — the fixed-batch hoisting above
accounts for the difference; hence the ablation mode.

Run: `python benchmarks/profile_step.py [--batch 256] [--precision highest]`
Prints one JSON line per row, then a table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import bench  # noqa: E402
from _harness import time_epoch  # noqa: E402, F401  (shared slope harness)


def jitter(key, arr):
    """Value-preserving key dependence: adds (key bit) * 1e-38 to a SMALL
    array so a micro-bench body is not loop-invariant (XLA would hoist it)
    while the f32 result is bit-identical for this model's value range."""
    import jax.numpy as jnp

    bit = (key[0] & 1).astype(jnp.float32)
    return arr + bit * 1e-38


def time_scan(fn, iters=2000, repeats=3):
    """min sec/iter of `lax.scan` over `fn(key)`.

    Sync methodology (same as bench.py): on the tunneled backend
    `block_until_ready` can return before remote execution finishes — only
    a `device_get` truly synchronizes. Each timing therefore measures TWO
    call counts ending in a scalar fetch and takes the slope, cancelling
    the constant dispatch+sync overhead; large `iters` amortizes per-call
    noise further. min-of-repeats suppresses tunnel hiccups."""
    import jax
    import jax.numpy as jnp

    def scanned(key):
        def body(carry, i):
            out = fn(jax.random.fold_in(key, i))
            s = sum(
                jnp.sum(x) for x in jax.tree_util.tree_leaves(out)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            )
            return carry + s.astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return tot

    jfn = jax.jit(scanned)
    key = jax.random.PRNGKey(0)
    float(jax.device_get(jfn(key)))  # compile + warm, hard sync

    def run(ncalls, base):
        t0 = time.perf_counter()
        r = None
        for i in range(ncalls):
            r = jfn(jax.random.fold_in(key, base + i))
        float(jax.device_get(r))  # device executes FIFO: syncs all calls
        return time.perf_counter() - t0

    run(1, 50)
    best = float("inf")
    for rep in range(repeats):
        t_short = run(1, 100 + 10 * rep)
        t_long = run(4, 200 + 10 * rep)
        best = min(best, (t_long - t_short) / 3)
    return best / iters


# ------------------------------------------------------------- ablation
def _cohort(cfg, n_batches):
    import jax.numpy as jnp

    n = cfg.batch_size * n_batches
    rng = np.random.RandomState(0)
    ob, mask, ts, ae, fv, fvm = bench.make_batch(rng, n)
    data = {
        "ob": jnp.asarray(ob), "padding_mask": jnp.asarray(mask),
        "timestamp": jnp.asarray(ts), "ae_mask": jnp.asarray(ae),
    }
    if cfg.aux_tasks:
        data["future_vital"] = jnp.asarray(fv)
        data["future_vital_mask"] = jnp.asarray(fvm)
    return data


def time_gather(cfg, n_batches=20, epochs=8):
    """sec/step of ONLY the per-step cohort gather (sum-reduced so the
    gathered planes are consumed): the floor the HBM-resident design pays
    before any model work."""
    import jax
    import jax.numpy as jnp

    from deep_interpolation_clustering_tpu.train.steps import gather_batch

    B = cfg.batch_size
    n = B * n_batches
    data = _cohort(cfg, n_batches)
    idx = jnp.arange(n).reshape(n_batches, B)

    @jax.jit
    def epoch(data, idx_mat, key):
        def body(carry, idx):
            b = gather_batch(data, idx)
            s = sum(jnp.sum(v) for v in b.values())
            return carry + s, None
        tot, _ = jax.lax.scan(body, jnp.float32(0), idx_mat)
        return tot

    key = jax.random.PRNGKey(0)
    float(jax.device_get(epoch(data, idx, key)))

    def run(ncalls):
        t0 = time.perf_counter()
        r = None
        for _ in range(ncalls):
            r = epoch(data, idx, key)
        float(jax.device_get(r))
        return time.perf_counter() - t0

    run(1)
    t_short = run(2)
    t_long = run(epochs + 2)
    return (t_long - t_short) / epochs / n_batches


def time_eval_epoch(cfg, n_batches=20, epochs=8):
    """sec/step of the fused FORWARD-only epoch (make_eval_epoch with all
    dumps dropped): real path minus backward minus optimizer."""
    import jax
    import jax.numpy as jnp

    from deep_interpolation_clustering_tpu.models import init_net
    from deep_interpolation_clustering_tpu.train.steps import make_eval_epoch

    B = cfg.batch_size
    n = B * n_batches
    data = _cohort(cfg, n_batches)
    params, state = init_net(jax.random.PRNGKey(1), cfg)
    epoch_fn = make_eval_epoch(cfg, denoise=False, dump_keys=())
    idx = jnp.arange(n).reshape(n_batches, B)
    mask_mat = jnp.ones((n_batches, B), jnp.float32)
    key = jax.random.key(2, impl=cfg.prng_impl)  # impl rides the key

    def call(k):
        losses, _ = epoch_fn(params, state, data, idx, mask_mat, k)
        return losses

    float(jax.device_get(call(key)["loss"][-1]))

    def run(ncalls, base):
        t0 = time.perf_counter()
        losses = None
        for i in range(ncalls):
            losses = call(jax.random.fold_in(key, base + i))
        float(jax.device_get(losses["loss"][-1]))
        return time.perf_counter() - t0

    run(1, 50)
    t_short = run(2, 100)
    t_long = run(epochs + 2, 200)
    return (t_long - t_short) / epochs / n_batches


def run_ablate(args):
    from deep_interpolation_clustering_tpu import Config

    base = dict(
        batch_size=args.batch, matmul_precision=args.precision,
        epoch_scan_unroll=args.unroll, prng_impl=args.prng,
    )
    cases = {
        "full": Config(**base),
        "no_fake": Config(**base, fake_detection=False, loss="ae_mse_sup"),
        "no_aux": Config(**base, aux_tasks={}, loss="ae_mse_fake_detect"),
        "no_dropout": Config(**base, dropout=0.0),
        "no_clip_sgd": Config(**base, optimizer="sgd", grad_clip=0.0),
        "plain_ae": Config(
            **base, fake_detection=False, aux_tasks={}, loss="ae_mse",
            dropout=0.0,
        ),
    }
    rows = {}
    for name, cfg in cases.items():
        rows[name] = time_epoch(cfg)
        print(json.dumps({"case": name,
                          "us_per_step": round(1e6 * rows[name], 1)}),
              flush=True)
    for name, fn in (("gather_only", time_gather),
                     ("eval_fwd_epoch", time_eval_epoch)):
        rows[name] = fn(cases["full"])
        print(json.dumps({"case": name,
                          "us_per_step": round(1e6 * rows[name], 1)}),
              flush=True)
    full = rows["full"]
    print("\n| case | us/step | delta vs full (us) |")
    print("|---|---|---|")
    for name, sec in rows.items():
        print(f"| {name} | {1e6 * sec:,.1f} | {1e6 * (sec - full):+,.1f} |")


# ---------------------------------------------------------------- micro
def run_micro(args):
    import jax
    import jax.numpy as jnp

    from deep_interpolation_clustering_tpu import Config
    from deep_interpolation_clustering_tpu.data.loader import make_fake_ob
    from deep_interpolation_clustering_tpu.models import forward, init_net
    from deep_interpolation_clustering_tpu.models.net import _encode
    from deep_interpolation_clustering_tpu.ops.interpolation import (
        cci_forward,
        sci_forward,
    )
    from deep_interpolation_clustering_tpu.ops.lstm import bilstm_forward
    from deep_interpolation_clustering_tpu.ops.rbf import rbf_decode
    from deep_interpolation_clustering_tpu.train import make_optimizer
    from deep_interpolation_clustering_tpu.train.steps import (
        _make_update,
        build_inputs,
        _forward_and_losses,
    )

    B = args.batch
    cfg = Config(batch_size=B, matmul_precision=args.precision)
    C, T, R = cfg.num_variables, cfg.num_timestamps, cfg.ref_points
    rng = np.random.RandomState(0)
    ob, mask, ts, ae, fv, fvm = bench.make_batch(rng, B)
    batch = {
        "ob": jnp.asarray(ob), "padding_mask": jnp.asarray(mask),
        "timestamp": jnp.asarray(ts), "ae_mask": jnp.asarray(ae),
        "future_vital": jnp.asarray(fv), "future_vital_mask": jnp.asarray(fvm),
    }
    key0 = jax.random.PRNGKey(1)
    params, state = init_net(key0, cfg)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    update = _make_update(cfg, optimizer, denoise=False)

    inputs0 = jax.jit(
        lambda b, k: build_inputs(cfg, b, k, train=True, denoise=False)
    )(batch, key0)
    x2 = jnp.concatenate([inputs0["x"], inputs0["fake_x"]], axis=0)  # (2B,4C,T)
    with jax.default_matmul_precision(cfg.matmul_precision):
        rep2 = jax.jit(lambda x: cci_forward(
            params["cci"]["kernel"],
            sci_forward(params["sci"]["kernel"], x, R, cfg.hours_from_admission),
        ))(x2)
        rep_tm = jnp.transpose(rep2, (1, 0, 2))  # (R, 2B, 3C)
        enc_out, hidden, cell = jax.jit(
            lambda r: bilstm_forward(params["encoder"], r)
        )(rep_tm)
        dec_out, _, _ = jax.jit(lambda e, h, c: bilstm_forward(
            params["decoder"], jax.nn.relu(e), h, c
        ))(enc_out, hidden, cell)
    interp = jnp.transpose(dec_out[:, :B], (1, 0, 2))  # (B, R, 2H)

    def with_prec(f):
        def g(*a, **kw):
            with jax.default_matmul_precision(cfg.matmul_precision):
                return f(*a, **kw)
        return g

    def sci_p(k):
        return {"kernel": jitter(k, params["sci"]["kernel"])}

    def lstm_p(k, p):
        return {**p, "fwd": {**p["fwd"], "b_ih": jitter(k, p["fwd"]["b_ih"])}}

    rows = {}
    rows["full_update"] = time_scan(
        lambda k: update(params, state, opt_state, batch, k)[3]["loss"],
        iters=args.iters,
    )
    rows["fwd_loss"] = time_scan(
        lambda k: _forward_and_losses(
            params, state, cfg, inputs0, True, k
        )[1]["loss"],
        iters=args.iters,
    )
    rows["forward"] = time_scan(
        with_prec(lambda k: forward(
            params, state, cfg, inputs0["x"], fake_x=inputs0["fake_x"],
            fake_perm_idx=inputs0["fake_perm_idx"], train=True, key=k,
        ).hidden),
        iters=args.iters,
    )
    rows["encode"] = time_scan(
        with_prec(lambda k: _encode({**params, "sci": sci_p(k)}, cfg, x2)[3]),
        iters=args.iters,
    )
    rows["sci"] = time_scan(
        with_prec(lambda k: sci_forward(
            jitter(k, params["sci"]["kernel"]), x2, R, cfg.hours_from_admission
        )),
        iters=args.iters,
    )
    rows["cci"] = time_scan(
        with_prec(lambda k: cci_forward(jitter(k, params["cci"]["kernel"]), rep2)),
        iters=args.iters,
    )
    rows["enc_lstm"] = time_scan(
        with_prec(lambda k: bilstm_forward(lstm_p(k, params["encoder"]), rep_tm)[0]),
        iters=args.iters,
    )
    rows["dec_lstm"] = time_scan(
        with_prec(lambda k: bilstm_forward(
            lstm_p(k, params["decoder"]), jax.nn.relu(enc_out), hidden, cell
        )[0]),
        iters=args.iters,
    )
    rows["rbf"] = time_scan(
        with_prec(lambda k: rbf_decode(
            {**params["rbf"], "kernel": jitter(k, params["rbf"]["kernel"])},
            state["rbf"], interp, inputs0["x"], R,
            cfg.hours_from_admission, cfg.dropout, True, k, cfg.rbf_basis,
            use_pallas=cfg.use_pallas,
        )[0]),
        iters=args.iters,
    )
    rows["build_inputs"] = time_scan(
        lambda k: build_inputs(cfg, batch, k, train=True, denoise=False)["x"],
        iters=args.iters,
    )
    rows["fake_select"] = time_scan(
        lambda k: make_fake_ob(batch["ob"], batch["padding_mask"], k, cfg.scale),
        iters=args.iters,
    )
    rows["grad+opt (full-fwd)"] = rows["full_update"] - rows["fwd_loss"]

    for name, sec in rows.items():
        print(json.dumps({"component": name, "us_per_iter": round(1e6 * sec, 1)}),
              flush=True)
    print("\n| component | us/iter | % of full_update |")
    print("|---|---|---|")
    full = rows["full_update"]
    for name, sec in sorted(rows.items(), key=lambda kv: -kv[1]):
        print(f"| {name} | {1e6 * sec:,.1f} | {100 * sec / full:.1f} |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--precision", default="high")
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--prng", default="threefry2x32")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--mode", choices=("ablate", "micro"), default="ablate")
    args = ap.parse_args()
    if args.mode == "ablate":
        run_ablate(args)
    else:
        run_micro(args)


if __name__ == "__main__":
    main()
