"""Headline benchmark: pretrain train-step throughput (encounters/sec).

Measures the framework's jitted data-parallel train step at the reference's
production shapes (batch 256, C=6, T=354, R=6 — p1_pretrain_main.py
defaults) on whatever accelerator is available, and — when torch can build
the reference model (it is pure torch; /root/reference imported read-only
with a stub for its missing `warmup_scheduler` dependency) — times the
reference's forward+backward+step on the host CPU for the
`vs_baseline` ratio (BASELINE.md: ≥20x target).

Prints ONE JSON line:
  {"metric": "pretrain_throughput", "value": N, "unit": "encounters/sec",
   "vs_baseline": R, "dec_throughput": N, "pretrain_roofline": {...},
   "dec_roofline": {...}}
where dec_throughput is the p3 DEC step (KL + cluster head) and the
roofline dicts report XLA-cost-model FLOPs/step, MFU, arithmetic
intensity, and HBM bandwidth utilization vs v5e single-chip peaks.
dec_* fields are None if the DEC path fails — the headline line must
still be emitted.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 256
C, T, HOURS = 6, 354, 6
WARMUP, STEPS = 3, 20


def make_batch(rng, b):
    counts = rng.randint(20, T + 1, size=(b, C))
    mask = (np.arange(T)[None, None, :] < counts[:, :, None]).astype(np.float32)
    ob = (rng.rand(b, C, T).astype(np.float32) * 5.0 - 2.5) * mask
    ts = np.sort(rng.rand(b, C, T).astype(np.float32) * HOURS, axis=-1) * mask
    ae = mask * (rng.rand(b, C, T) > 0.2).astype(np.float32)
    fv = rng.rand(b, C).astype(np.float32)
    fvm = (rng.rand(b, C) < 0.9).astype(np.float32)
    return ob, mask, ts, ae, fv, fvm


def _require_backend(timeout_s: float = 1650.0):
    """Fail with a diagnostic if the accelerator backend cannot initialize.
    The axon TPU tunnel can wedge (PJRT init blocks in make_c_api_client —
    seen 2026-08-17/18); without this guard the bench hangs silently and
    the round records nothing. The deadline sits just past the pool's own
    observed claim-resolution time (~1503 s measured: a queued claim either
    gets granted or fails UNAVAILABLE at that mark), so a merely-queued
    claim behind a healthy worker still succeeds. Init runs in a daemon
    thread because the hung PJRT call is not interruptible."""
    import threading

    out = {}

    def probe():
        try:
            import jax

            out["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # noqa: BLE001 — any init failure is terminal
            out["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    err = None
    if t.is_alive():
        err = (f"backend init hung >{timeout_s:.0f}s — TPU tunnel wedged "
               "(PJRT make_c_api_client never returned)")
    elif "error" in out:
        err = f"backend init failed: {out['error']}"
    if err:
        print(json.dumps({
            "metric": "pretrain_throughput", "value": None,
            "unit": "encounters/sec", "vs_baseline": None, "error": err,
        }))
        sys.exit(1)


def _enable_compilation_cache():
    """Persistent XLA compilation cache via the CLIs' own helper (same
    default dir, so bench and pipeline runs share compiles): the bench
    compiles ~8 programs per run (4 epoch variants x [execute +
    cost-analysis lower/compile] + 2 parity forwards) at ~20-40 s each on
    the tunneled TPU; cached re-runs skip all of it. Traced-fingerprint
    keyed, so a code change recompiles; no-ops if the user pre-configured
    a cache dir."""
    from deep_interpolation_clustering_tpu import Config
    from deep_interpolation_clustering_tpu.cli.common import (
        enable_compilation_cache,
    )

    enable_compilation_cache(Config())


def bench_ours(
    clustering: bool = False,
    batch: int = BATCH,
    matmul_precision: str = "high",
    steps: int = STEPS,
    epoch_scan_unroll: int = 1,
    prng_impl: str = "threefry2x32",
):
    """The trainer's production path: HBM-resident cohort, fused lax.scan
    epoch (one dispatch), data-parallel over all available chips.
    `clustering=True` benches the DEC (p3) step — KL + cluster head on top
    of the pretrain losses (reference clustering_trainer.py:228-272).
    `batch`/`matmul_precision` parameterize the throughput-frontier sweep
    (benchmarks/sweep_frontier.py) and the peak-config point.

    Returns (encounters_per_sec, cost) where cost carries the XLA
    cost-analysis FLOPs/bytes per step for the roofline summary."""
    import jax
    import jax.numpy as jnp

    from deep_interpolation_clustering_tpu import Config
    from deep_interpolation_clustering_tpu.models import init_net
    from deep_interpolation_clustering_tpu.parallel import make_mesh, replicate_tree
    from deep_interpolation_clustering_tpu.train import make_optimizer
    from deep_interpolation_clustering_tpu.train.steps import make_train_epoch

    BATCH, STEPS = batch, steps  # noqa: N806 — local overrides of the defaults
    cfg = Config(
        batch_size=BATCH, num_timestamps=T, matmul_precision=matmul_precision,
        epoch_scan_unroll=epoch_scan_unroll,
    )
    if clustering:
        cfg = cfg.replace(loss="ae_mse_sup_fake_detect_kl")
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 and BATCH % n_dev == 0 else None

    key = jax.random.PRNGKey(0)
    params, state = init_net(key, cfg, clustering=clustering)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    if mesh is not None:
        params = replicate_tree(mesh, params)
        state = replicate_tree(mesh, state)
        opt_state = replicate_tree(mesh, opt_state)

    n_cohort = BATCH * STEPS
    rng = np.random.RandomState(0)
    ob, mask, ts, ae, fv, fvm = make_batch(rng, n_cohort)
    data = {
        "ob": ob, "padding_mask": mask, "timestamp": ts, "ae_mask": ae,
        "future_vital": fv, "future_vital_mask": fvm,
    }
    data = {k: jnp.asarray(v) for k, v in data.items()}
    if mesh is not None:
        data = replicate_tree(mesh, data)
    idx_mat = np.arange(n_cohort, dtype=np.int32).reshape(STEPS, BATCH)
    idx_mat = jnp.asarray(idx_mat)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        idx_mat = jax.device_put(idx_mat, NamedSharding(mesh, P(None, "data")))

    epoch_fn = make_train_epoch(cfg, optimizer, denoise=False)

    # Timing methodology: on a tunneled backend, block_until_ready can
    # return before remote execution finishes — only a device_get truly
    # synchronizes. Measure two run lengths each ending in a scalar fetch
    # and take the slope, cancelling the constant sync/dispatch overhead.
    root_key = jax.random.key(0, impl=prng_impl)

    def run(n: int, base: int):
        nonlocal params, state, opt_state
        t0 = time.perf_counter()
        for i in range(n):
            params, state, opt_state, losses = epoch_fn(
                params, state, opt_state, data, idx_mat,
                jax.random.fold_in(root_key, base + i),
            )
        float(jax.device_get(losses["loss"][-1]))  # hard sync
        return time.perf_counter() - t0

    run(WARMUP, 0)  # compile + warm
    # 16-epoch slope interval: at ~17 ms/epoch the measured span is ~270 ms,
    # large against the tunnel's ms-scale sync jitter (was 8 epochs, which
    # left +-9% run-to-run spread)
    t_short = run(4, 100)
    t_long = run(20, 200)
    per_epoch = (t_long - t_short) / 16

    # XLA's own cost model for the compiled epoch: FLOPs + HBM traffic,
    # for the roofline summary (per STEP, not per epoch). With
    # epoch_scan_unroll=k the cost model multiplies the k-step loop body by
    # the ORIGINAL trip count (measured exactly 4.00x at unroll=4), so
    # divide the overcount back out.
    cost = {}
    try:
        ca = (
            epoch_fn.lower(params, state, opt_state, data, idx_mat,
                           jax.random.fold_in(root_key, 0))
            .compile()
            .cost_analysis()
        )
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        denom = STEPS * max(epoch_scan_unroll, 1)
        cost = {
            "flops_per_step": ca.get("flops", 0.0) / denom,
            "bytes_per_step": ca.get("bytes accessed", 0.0) / denom,
        }
    except Exception as e:  # cost analysis is best-effort
        print(f"cost analysis unavailable: {e}", file=sys.stderr)

    cost["sec_per_step"] = per_epoch / STEPS
    return n_cohort / per_epoch, cost


def bench_reference() -> float:
    """Reference torch model, forward+loss+backward+step on host CPU."""
    import types

    sys.modules.setdefault(
        "warmup_scheduler", types.SimpleNamespace(GradualWarmupScheduler=object)
    )
    sys.path.insert(0, "/root/reference")
    import torch

    from pretrain_interp import Net  # noqa: E402  (reference, read-only)

    args = types.SimpleNamespace(
        num_variables=C, num_timestamps=T, hours_from_admission=HOURS,
        ref_points=6, dropout=0.2, fake_detection=True, triple_margin=0.0,
        aux_tasks={"future_vital": 0.5},
        aux_pos_weights={"future_vital": 1.0},
        unsup_aux_tasks={"fake_detection": 1.0},
        loss="ae_mse_sup_fake_detect", scale=5,
    )
    device = torch.device("cpu")
    model = Net(args, device).to(device)
    opt = torch.optim.Adam(model.parameters(), lr=3e-3, amsgrad=True, weight_decay=4e-4)

    rng = np.random.RandomState(0)
    ob, mask, ts, ae, fv, fvm = make_batch(rng, BATCH)
    x = torch.tensor(np.concatenate([ob, mask, ts, ae], axis=1))
    fake = x.clone()
    perm = torch.randperm(2 * BATCH)
    label = torch.cat([torch.ones(BATCH), torch.zeros(BATCH)])[perm].to(torch.int64)
    fv_t, fvm_t = torch.tensor(fv), torch.tensor(fvm)
    ob_t, mask_t = torch.tensor(ob), torch.tensor(mask)

    def one_step():
        opt.zero_grad()
        hidden, rec, aux = model(x, fake, perm, None)
        rec_d = model.rec_loss(ob_t, rec, mask_t)
        aux_d = model.sup_aux_loss(args.aux_tasks, {"future_vital": fv_t}, aux, fvm_t)
        fake_d = model.fake_det_loss(label, aux["fake_det"])
        tasks = dict(args.aux_tasks); tasks.update(args.unsup_aux_tasks)
        losses = dict(aux_d); losses.update(fake_d)
        loss_d = model.multi_task_loss(tasks, rec_d, losses)
        loss_d["loss"].backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 15.0)
        opt.step()

    one_step()  # warmup
    # >=20 timed steps: the 3-step timing wobbled 2.3x run-to-run on a
    # loaded host; 20 steps brings the spread under ~10%
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        one_step()
    dt = time.perf_counter() - t0
    return BATCH * n / dt


def bench_onchip_parity(matmul_precision: str = "highest") -> dict:
    """Machine-check forward numerics on the REAL backend every round (the
    CPU suite checks them on CPU only; the on-chip number was previously
    hand-measured). Committed fixture: torch-exported weights + masked input
    + torch eval outputs at the production shape B=32/C=6/T=354/R=6
    (benchmarks/make_parity_fixture.py). The eval forward runs at the GIVEN
    precision (both Config knobs pinned to it — this function measures "the
    chip at precision X"; which X each surface sees in production is
    config.py's matmul_precision/eval_matmul_precision split). Two numbers,
    forward jitted (the real execution path):

      * vs_torch — max |diff| of latent+reconstruction against the torch
        reference. Measured on the v5e: 5.1e-5 on the latent at "highest"
        (the r5 production eval default; gate 1e-4), 1.066e-4 at "high"
        (the train-path envelope; gate 2.5e-4).
      * vs_host_cpu — max |diff| of the SAME jitted forward on the real
        chip vs the in-process CPU backend — i.e. the divergence is the
        CHIP's, not the rebuild's: jitted host-CPU agrees with torch to
        2.6e-6 even at T=354, well inside the 1e-5 contract
        (suite-checked at T=30, tests/test_torch_parity.py). Same gates.

    The residue is decomposed per stage in benchmarks/parity_ledger.py
    (r4): the chip's log/log1p is ~300 ulp off, which through the SCI
    softplus kernel and kappa=10 transient logits injected the old 5.7e-4;
    ops/numerics.py Newton-refines those logs (raw SCI injects 1.52e-3
    isolated, refined 1.1e-4). What remains at "high" splits between
    bf16_3x LSTM matmul rounding (removed at "highest") and the chip
    exp's ~10-ulp relative error on the CCI intensity values — each unit's
    accuracy floor. Gates sit ~2x above the measured floors to absorb
    compiler drift.
    """
    import os

    import jax
    import jax.numpy as jnp

    from deep_interpolation_clustering_tpu import Config
    from deep_interpolation_clustering_tpu.models import forward
    from deep_interpolation_clustering_tpu.train.checkpoint import _unflatten_nested

    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "onchip_parity.npz",
    )
    with np.load(fixture) as z:
        arrays = {k: z[k] for k in z.files}
    params = _unflatten_nested(
        {k[len("params/"):]: v for k, v in arrays.items() if k.startswith("params/")}
    )
    state = _unflatten_nested(
        {k[len("state/"):]: v for k, v in arrays.items() if k.startswith("state/")}
    )
    cfg = Config(
        fake_detection=False, aux_tasks={},
        matmul_precision=matmul_precision,
        eval_matmul_precision=matmul_precision,
    )
    fwd = jax.jit(lambda p, s, xx: forward(p, s, cfg, xx, train=False))

    def run(device):
        out = fwd(
            jax.device_put(params, device),
            jax.device_put(state, device),
            jax.device_put(jnp.asarray(arrays["x"]), device),
        )
        return np.asarray(out.hidden), np.asarray(out.rec)

    h_dev, r_dev = run(jax.devices()[0])
    h_cpu, r_cpu = run(jax.devices("cpu")[0])
    vs_torch = max(
        float(np.max(np.abs(h_dev - arrays["torch_hidden"]))),
        float(np.max(np.abs(r_dev - arrays["torch_rec"]))),
    )
    vs_host = max(
        float(np.max(np.abs(h_dev - h_cpu))), float(np.max(np.abs(r_dev - r_cpu)))
    )
    return {"vs_torch": vs_torch, "vs_host_cpu": vs_host}


# v5e (TPU v5 lite) single-chip peaks for the roofline ratios
V5E_PEAK_F32_FLOPS = 4.92e13  # MXU fp32 ~= bf16/4
V5E_PEAK_HBM_BPS = 8.19e11  # 819 GB/s

# The torch-CPU reference baseline wobbles ~2.5x with host load (measured
# 102-262 enc/s across hours of runs; the 262 reading is an idle host,
# 2026-08-18), so the headline ratio quotes this measured band alongside
# the same-session point. The live point can even fall BELOW the band when
# something else is chewing the host during bench (an 86.5 reading was
# taken concurrently with a pytest lane) — the band is the calibrated
# anchor, the point is this session's weather.
BASELINE_BAND_ENC_S = (102.0, 262.0)


def _roofline(cost: dict) -> dict:
    """Roofline placement from XLA's cost model: achieved FLOP/s and HBM
    bandwidth vs chip peaks, plus arithmetic intensity. The model is
    bandwidth/latency-bound (broadcast-reduce chains over the (B,C,T,R)
    grid, R=6-step LSTMs), so MFU is structurally tiny — the honest
    utilization number is the bandwidth one."""
    out = {}
    sec = cost.get("sec_per_step")
    flops = cost.get("flops_per_step")
    byts = cost.get("bytes_per_step")
    if not sec or not flops:
        return out
    out["flops_per_step"] = round(flops)
    out["mfu_pct"] = round(100.0 * flops / sec / V5E_PEAK_F32_FLOPS, 3)
    if byts:
        out["arith_intensity_flops_per_byte"] = round(flops / byts, 2)
        out["hbm_bw_util_pct"] = round(100.0 * byts / sec / V5E_PEAK_HBM_BPS, 1)
    return out


def main():
    _require_backend()
    _enable_compilation_cache()
    ours, cost = bench_ours()
    try:
        dec, dec_cost = bench_ours(clustering=True)
    except Exception as e:  # never let the DEC bench kill the headline line
        print(f"DEC bench unavailable: {e}", file=sys.stderr)
        dec, dec_cost = None, {}
    # Peak/tuned configs from the r3 frontier sweeps (benchmarks/
    # sweep_frontier.py, tables in PARITY.md) plus the two opt-in
    # throughput knobs (interleaved measurements, PARITY.md r3):
    # epoch_scan_unroll=4 (trades fused==stepped bit-identity for
    # reduction-order drift) and prng_impl="rbg" (trades cross-backend/
    # sharding RNG determinism for the hardware RNG). The headline `value`
    # stays the parity-gated production config (B=256, "high",
    # machine-checked above). `tuned` keeps the parity-gated "high"
    # matmuls at the production batch — every numeric contract that
    # matters for eval parity still holds (B=512 buys nothing under
    # unroll=4, which already provides the cross-step overlap bigger
    # batches otherwise would; interleaved 2-rep r3 measurement).
    # `peak` adds bf16 matmuls AND B=512 on top: at "default" precision
    # B=512 reads a consistent +3-4% over 256 (667k vs 639k / 632 vs 615,
    # same-rep interleaved pairs).
    # single source of truth: these kwargs dicts ARE both the bench_ours
    # arguments and the *_config records in the JSON line — hand-copied
    # literals drifted once already
    tuned_kwargs = {"batch": BATCH, "matmul_precision": "high",
                    "epoch_scan_unroll": 4, "prng_impl": "rbg"}
    peak_kwargs = {**tuned_kwargs, "batch": 512,
                   "matmul_precision": "default"}
    try:
        tuned, tuned_cost = bench_ours(**tuned_kwargs)
    except Exception as e:
        print(f"tuned-config bench unavailable: {e}", file=sys.stderr)
        tuned, tuned_cost = None, {}
    try:
        peak, peak_cost = bench_ours(**peak_kwargs)
    except Exception as e:
        print(f"peak-config bench unavailable: {e}", file=sys.stderr)
        peak, peak_cost = None, {}
    try:
        ref = bench_reference()
        vs = ours / ref
    except Exception as e:
        print(f"reference baseline unavailable: {e}", file=sys.stderr)
        vs = None
    try:
        # the production eval/dump surface (eval_matmul_precision default
        # "highest"): measured floor 5.1e-5, gate 1e-4 (~2x headroom)
        parity = bench_onchip_parity("highest")
        # the train-path envelope ("high" bf16_3x matmuls): 2.5e-4 =
        # ~2.3x the 1.07e-4 measured floor (parity_ledger.py r4)
        parity_train = bench_onchip_parity("high")
        parity_ok = (
            parity["vs_torch"] <= 1e-4 and parity["vs_host_cpu"] <= 1e-4
            and parity_train["vs_torch"] <= 2.5e-4
            and parity_train["vs_host_cpu"] <= 2.5e-4
        )
        if not parity_ok:
            print(f"ON-CHIP PARITY REGRESSION: eval={parity} "
                  f"train={parity_train}", file=sys.stderr)
    except Exception as e:
        print(f"on-chip parity check unavailable: {e}", file=sys.stderr)
        parity, parity_train, parity_ok = None, None, None
    # Per-profile parity: parity/tuned both pin the eval forward at
    # "highest" (config.py _PROFILES), so they share the machine-checked
    # numbers; `peak` runs plain-bf16 matmuls on BOTH paths and is measured
    # separately — it FAILS the vs-torch contract by design (throughput
    # exploration only), so its field records the actual envelope instead
    # of implying coverage.
    try:
        peak_parity = bench_onchip_parity(matmul_precision="default") \
            if parity is not None else None
    except Exception as e:
        print(f"peak-profile parity unavailable: {e}", file=sys.stderr)
        peak_parity = None
    profile_parity = {
        "parity": parity,
        "tuned": parity,
        "peak": peak_parity,
        "peak_meets_contract": (
            None if peak_parity is None else peak_parity["vs_torch"] <= 2.5e-4
        ),
    }
    rec = {
        "metric": "pretrain_throughput",
        "value": round(ours, 1),
        "unit": "encounters/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        # measured band for the torch-CPU baseline (point above is this
        # session's host state); value / (band hi, lo)
        "vs_baseline_band": [
            round(ours / BASELINE_BAND_ENC_S[1], 1),
            round(ours / BASELINE_BAND_ENC_S[0], 1),
        ],
        "dec_throughput": round(dec, 1) if dec is not None else None,
        "tuned_throughput": round(tuned, 1) if tuned is not None else None,
        "tuned_config": {"num_timestamps": T, **tuned_kwargs},
        "peak_throughput": round(peak, 1) if peak is not None else None,
        "peak_config": {"num_timestamps": T, **peak_kwargs},
        "pretrain_roofline": _roofline(cost),
        "tuned_roofline": _roofline(tuned_cost),
        "peak_roofline": _roofline(peak_cost),
        "dec_roofline": _roofline(dec_cost),
        # vs_torch: on-chip envelope at T=354 of the production EVAL
        # surface (eval_matmul_precision="highest"; gate 1e-4 — the 1e-5
        # contract holds on host CPU even at T=354). vs_host_cpu: what the
        # chip itself changes vs the same jitted code on host (gate 1e-4).
        "onchip_parity_max_abs": parity,
        # the train-path precision envelope (matmul_precision="high",
        # bf16_3x; gate 2.5e-4)
        "onchip_parity_train_precision": parity_train,
        "onchip_parity_ok": parity_ok,
        # per perf_profile (config.py): parity/tuned pin eval at "highest";
        # peak is measured at its own bf16 matmuls
        "profile_parity": profile_parity,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
