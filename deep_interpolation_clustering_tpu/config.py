"""Single typed configuration shared by every pipeline stage (p0-p4).

The reference spreads ~35 argparse flags across four entry scripts
(p1_pretrain_main.py:18-101, p3_clustering_main.py:17-105, p2:29-42, p4:30-40)
plus dict-valued defaults that are not CLI-settable. Here the whole surface is
one dataclass, serialized as JSON alongside every run directory so any run can
be reproduced or restored (`load_config`, reference utils.py:44-57).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass
class Config:
    # ---- general -------------------------------------------------------
    seed: int = 7529
    log_level: str = "INFO"
    mode: str = "train"  # train | eval
    restore: bool = False
    # metric used to restore pretrain weights (reference p1:33-34)
    restore_metric: str = "ae_mse"
    # metric used to restore DEC weights (reference p3:29)
    dc_restore_metric: str = "ae_mse"
    log_train_freq: int = 20
    log_valid_freq: int = 20

    # ---- data ----------------------------------------------------------
    hours_from_admission: int = 6
    batch_size: int = 256
    norm_method: str = "minmax"
    aug_input: bool = False
    aug_std: float = 0.1
    # affine input scaling: x -> scale*x - scale/2, mapping [0,1] to
    # [-scale/2, scale/2] (reference dataloader.py:74-79)
    scale: float = 5.0
    denoise: bool = False
    num_variables: int = 6
    # dense padded length T (max observation count, reference p1:52)
    num_timestamps: int = 354
    evaluate_interpolation: bool = False
    # feature-dump payload for eval(generate_feat=True) (p1/p3 out_feat):
    #   "full" — every per-encounter output incl. the (n, V, T) rec_ob
    #            reconstructions, matching the reference's dump files.
    #   "lean" — only the keys p2/p4 consume (hidden + the DEC probability
    #            keys; ob/padding_mask/timestamp ride along from host
    #            planes). At 100k/T=354 "full" fetches ~850 MB of rec_ob
    #            over the 1-15 MB/s D2H tunnel (~200 s across 3 cohorts);
    #            "lean" fetches ~few MB. Pick "lean" unless you want the
    #            reconstructions themselves (e.g. evaluate_interpolation
    #            inspection).
    feat_dump: str = "full"
    # fraction of observed points held out for the autoencoder loss
    # (reference p0_data_process.py:95-117)
    holdout_frac: float = 0.2

    # ---- model ---------------------------------------------------------
    ref_points: int = 6
    dropout: float = 0.2
    lstm_hidden: int = 128
    head_hidden: int = 128
    fake_detection: bool = True
    triple_margin: float = 0.0
    triple_pos_std: float = 0.1
    rbf_basis: str = "gaussian"

    # ---- clustering (DEC, p3) -----------------------------------------
    cluster_number: int = 4
    dec_alpha: float = 1.0
    init_cluster_center: str = "kmeans"  # kmeans | random | none
    stopping_delta: Optional[float] = 1e-4
    # DEC stopping rule (checked every update_interval-th epoch):
    #   "delta"    — the reference's criterion: stop when the FRACTION of
    #                changed validation labels < stopping_delta
    #                (clustering_trainer.py:118-124). Scale caveat: at 100k
    #                (15k validation rows) delta < 1e-4 means "at most ONE
    #                changed label" — measured to never fire over 400
    #                epochs (PARITY.md r4 negative result), so large runs
    #                are max_epochs-capped.
    #   "count"    — stop when the NUMBER of changed validation labels
    #                <= stopping_count: the scale-invariant meaning of the
    #                reference's intent (its 1e-4 at its ~2.4k-row cohorts
    #                ≈ "0 labels changed").
    #   "patience" — stop when the running delta minimum hasn't improved
    #                for stopping_patience consecutive checks: converges on
    #                any n where delta plateaus without reaching the
    #                absolute threshold.
    stopping_mode: str = "delta"
    stopping_count: int = 0
    stopping_patience: int = 20
    update_interval: int = 1
    # Deferred DEC cadence only (eval_interval>1, single-process fused):
    # fetch epoch e's changed-label count AFTER dispatching epoch e+1's
    # train, hoping to overlap the one mandatory per-epoch D2H sync with
    # device compute. Stop semantics are exact: the loop snapshots the
    # pre-dispatch carries (one jitted device copy — the fused step
    # donates its inputs) and rolls back when the lagged criterion fires,
    # so the stopping epoch, the delta trajectory AND the final weights
    # are bit-identical to the unpipelined cadence
    # (tests/test_dec_stopping.py). Measured at 100k/T=354 on the v5e:
    # NO win — 0.54 vs 0.52 s/epoch at 23 epochs (per-leaf snapshot
    # copies read 2.24 before the jitted bulk copy). The run-length
    # sweep shows why: the deferred loop's steady state is already
    # ~0.36 s/epoch vs the 0.31 s device floor; the rest of its headline
    # wall is once-per-run compile/boundary cost, which no fetch lag can
    # hide — kept OFF as the experiment record (PARITY.md r5).
    pipeline_delta: bool = False
    kmeans_n_init: int = 20
    # "device": on-device jitted k-means (production). "sklearn": host-side
    # NumPy mirror of sklearn.KMeans's exact RNG path — bit-identical labels
    # to a seeded reference run (cluster/sklearn_compat.py), for migration
    # validation against p4_clustering_final.py:159 / clustering_trainer.py:75.
    kmeans_impl: str = "device"
    # "device" (default): blocked MXU DBSCAN with min-label propagation —
    # sklearn-IDENTICAL labels (cluster/dbscan.py explains why the parity
    # is exact, tests/test_dbscan_device.py checks it), no host O(n^2 d)
    # radius query. "sklearn": the reference's host path
    # (p2_clustering_optK.py:109-168, p4_clustering_final.py:175-233).
    dbscan_impl: str = "device"

    # ---- learning ------------------------------------------------------
    loss: str = "ae_mse_sup_fake_detect"
    aux_tasks: Dict[str, float] = field(default_factory=lambda: {"future_vital": 0.5})
    aux_pos_weights: Dict[str, float] = field(
        default_factory=lambda: {
            "future_vital": 1.0,
            "AKI_overall": 1.0,
            "mort_status_30d": 1.0,
            "ICU": 1.0,
        }
    )
    unsup_aux_tasks: Dict[str, float] = field(
        default_factory=lambda: {"fake_detection": 1.0, "triplet": 1.0, "kl": 10.0}
    )
    max_epochs: int = 10000
    optimizer: str = "adam"  # adam (amsgrad) | sgd | rmsprop
    init_lr: float = 3e-3
    min_lr: float = 1e-6
    lr_decay_mode: str = "step"  # step | plateau | warmup
    lr_decay_step_or_patience: int = 20
    lr_decay_rate: float = 0.2
    warmup_multiplier: float = 8.0
    warmup_epochs: int = 10
    grad_clip: float = 15.0
    weight_decay_rate: float = 4e-4
    early_stopping: int = 50
    # validate / checkpoint / early-stop every k-th epoch (always on the
    # final one). 1 = the reference's eval-every-epoch cadence (default).
    # k>1 additionally lets the trainer DISPATCH the intermediate fused
    # train epochs back-to-back and defer every host loss-fetch to the
    # eval boundary — on the tunneled TPU backend the per-epoch
    # device_get round trip is the dominant trainer overhead at scale
    # (PARITY.md: 0.35 s/epoch wall vs 0.18 s/epoch device compute at the
    # 100k/B=4096 config), so batching k fetches into one recovers most
    # of the gap. Bit-identical training trajectory for the epoch-indexed
    # LR schedules ("step"/"warmup": stepped closed-form every epoch,
    # tests/test_trainer_modes.py::test_eval_interval_bit_identical);
    # "plateau" steps once per EVAL with that boundary's valid loss
    # (patience then counts evals, the torch-ecosystem eval_interval
    # semantics — it cannot see losses of epochs it never validated).
    # The DEC ClusterTrainer honors it too (r5): the per-epoch on-device
    # delta eval stays (stopping rides it, clustering_trainer.py:118-124)
    # but loss fetches / summaries / checkpoints defer to the boundary;
    # delta trajectory bit-identical across cadences
    # (tests/test_dec_stopping.py). See also pipeline_delta.
    eval_interval: int = 1

    # ---- K-selection (p2) ---------------------------------------------
    k_max: int = 10
    select_opt_k: Tuple[str, ...] = ("gap_sts", "elbow")
    n_init: int = 10
    gap_b: int = 10
    # gap statistic at scale: the inertias are O(n²) pairwise sweeps by the
    # reference's plain-Euclidean definition (p2_clustering_optK.py:334-351)
    # — ~5e14 FLOPs per (k, draw) at 1M rows, impractical exactly. >0 runs
    # the WHOLE gap sweep (reference draws, fits, inertias, internal
    # metrics) on a seeded uniform subsample of this many rows, restoring
    # the K-selection signal the 1M pipeline otherwise forfeits. Estimator
    # bias: gap(k) compares log-inertias of the subsample against uniform
    # references of the SAME size, so the Tibshirani statistic is
    # consistent under uniform subsampling; the per-k inertia VALUES are
    # the subsample's, not the cohort's (don't compare across different
    # subsample sizes), and ref_s reflects the subsample's Monte-Carlo
    # spread. 0 = exact full-cohort sweep (default).
    gap_subsample: int = 0
    opt_eps: float = 1.9
    internal_metrics: Tuple[str, ...] = (
        "Sihouette",
        "Davies-Bouldin_Index",
        "Calinski-Harabasz",
    )
    # recompute analytics artifacts even when their CSV already exists
    # (reference p2_clustering_optK.py:281-287 reloads gap_sts_v1.csv unless
    # overwrite — at 100k scale that is minutes of k-means redone per re-run)
    overwrite: bool = False

    # ---- final labels (p4) --------------------------------------------
    cluster_method: str = "kmeans"  # kmeans | dbscan | dl | consensus
    num_clusters: int = 4
    dl_cluster_label_type: str = "pred"  # pred | label

    # ---- paths ---------------------------------------------------------
    base_path: str = "Data"
    results_path: str = "Results"

    # ---- parallelism / kernels ------------------------------------------
    # number of devices in the data axis of the mesh; 0 = no mesh (single
    # device), -1 = all local devices
    data_parallel: int = 0
    # -------- multi-host data parallelism (parallel/multihost.py) --------
    # number of cooperating processes (hosts); 0 = single-process. When >0,
    # every CLI stage calls jax.distributed.initialize before first device
    # use, the data mesh spans the GLOBAL device set, and checkpoint /
    # feature / TB writes happen on process 0 only. Every process loads
    # the same cohort and seeds the same host RNG, so shuffle orders and
    # schedule decisions replicate without coordination.
    num_processes: int = 0
    # this process's rank in [0, num_processes); required unless the
    # coordinator auto-discovers it (TPU pods)
    process_id: int = -1
    # "host:port" of process 0's coordinator; empty = TPU-pod auto-discovery
    coordinator_address: str = ""
    # persistent XLA compilation cache shared across CLI runs — cuts the
    # cold-start compile of a repeated config ~4x (measured 11s -> 2.5s on
    # the fused epoch; the reference has no compile step at all, so this
    # is the cold-start answer). Empty string disables.
    compilation_cache_dir: str = "~/.cache/deep_interpolation_clustering_tpu/xla"
    # route the SCI interpolation + RBF decode through the fused Pallas TPU
    # kernels (ops/pallas_interp.py); off-TPU they run interpreted (slow,
    # tests only). On-chip the SCI kernel agrees with XLA to ~1e-4 (Mosaic
    # transcendental approximations), so leave this off on the strict
    # parity path.
    use_pallas: bool = False
    # compute SCI's ob-independent weight tensors once per step for streams
    # that share (mask, ts) — the fake stream at the production default
    # aug_input=False — instead of once per stream
    # (ops/interpolation.sci_forward_multi). Bit-identical by algebra: the
    # logit/softmax grid chain depends only on timestamps + padding mask
    # (reference interpolation_layer.py:59-83), so no parity flag is needed.
    # The gate is structural (Python object identity on the ts/mask leaves
    # at trace time, models/net._sci_streams) and falls back to per-stream
    # SCI whenever sharing can't be proven (augmented ts, external callers).
    # XLA-path only; the Pallas SCI variants keep their per-stream kernels.
    sci_share_weights: bool = True
    # keep the UNCHANGED XLA forward for SCI (the 1e-5 parity surface) but
    # run its BACKWARD as a fused Pallas kernel that recomputes the softmax
    # chains in VMEM instead of letting XLA materialize the (B,C,T,R)
    # softmax tensors in HBM between forward and backward
    # (ops/pallas_interp.sci_forward_hybrid). Gradients agree with XLA
    # autodiff to f32 rounding (~1e-6 relative; mask cotangents are 0
    # where mask==0 instead of the jnp path's NaN). Train-path only by
    # construction — eval takes no gradients.
    use_pallas_bwd: bool = False
    # route the encoder/decoder biLSTM recurrences through the fused Mosaic
    # kernel (ops/pallas_lstm.py): all R steps of both directions run in
    # one kernel per batch tile with the recurrent weights VMEM-resident,
    # and the backward is a hand-written reverse-walk kernel instead of
    # XLA's unrolled scan transpose. Math identical to the scan path
    # (fwd 9e-8, grads 2e-7 relative, tests/test_pallas_kernels.py).
    # MEASURED SLOWER on the real chip — 787.8 us/step vs 593.8 at the
    # B=256/T=354 production defaults (trace-based device timing, r3): the
    # (T, TILE, 4H) gate buffers cap the batch tile at ~112 rows under the
    # 16 MB VMEM stack budget, so the sequential grid serializes 5x6 small
    # matmul+gate chains where the XLA scan runs 6 at full batch — and the
    # gate transcendentals (the VPU-bound ~40% of LSTM cost) are the same
    # either way. Kept as a tested option; OFF by default.
    use_pallas_lstm: bool = False
    # run all MLP head trunks (RBF compress + future/aux/fake heads) as ONE
    # batched Linear->BN->Dropout->Linear chain (ops/nn.heads_apply_fused).
    # Identical math per head (BN stats stay per-head; block-diagonal fc2),
    # f32 drift ~1e-7 vs the unfused path; dropout patterns differ (one
    # draw instead of per-head draws). MEASURED SLOWER on the real chip at
    # the production shape — 959-995us/step fused vs 910-923 unfused at
    # B=256/T=354 (benchmarks/profile_step.time_epoch, r3): the off-segment
    # fc1 garbage FLOPs + row-concat copies cost more than the collapsed
    # op count saves. Kept as a tested option; OFF by default.
    fused_heads: bool = False
    # keep the whole training cohort resident in device HBM and gather
    # batches on-device by index (one upload per cohort instead of one
    # host->device transfer per batch); the 100k-encounter cohort is ~3.4 GB
    # at T=354 — far under a v5e chip's HBM
    device_data: bool = True
    # on a data mesh, row-shard the device-resident cohort planes across
    # the devices (P("data") block layout, parallel/cohort.py) instead of
    # replicating them: per-device HBM = cohort/D, so e.g. the 1M-encounter
    # T=354 cohort (~5.5 GB) costs ~0.7 GB per chip on a v5e-8 where
    # replication would eat a third of every chip's HBM. Storage is
    # permuted into each epoch's shuffle order by one all_to_all
    # ("epoch relayout"), so batches, RNG and numerics are identical to the
    # replicated path; steps slice blocks with zero per-step collectives.
    # Ignored off-mesh or when device_data=False. False reverts to
    # replicated HBM cohorts.
    shard_cohort: bool = True
    # fuse the whole epoch into one compiled lax.scan over batch indices
    # (one dispatch per epoch; per-batch losses still recorded, but live
    # per-batch console logs are emitted after the epoch). Requires
    # device_data; falls back to per-batch stepping otherwise.
    fused_epoch: bool = True
    # lax.scan `unroll` for the fused train/eval epoch bodies: unrolling k
    # steps per scan iteration lets XLA co-schedule the data-only ops
    # (gather, fake select, augment) of step i+1 with the compute of step i.
    # NOT bit-preserving: the unrolled body fuses differently, so gradient
    # reduction order shifts — measured max-param drift ~4e-5 after 5 Adam
    # steps (losses bit-identical; near-zero gradients amplified by Adam's
    # eps denominator). Keep 1 (the default) on the fused==stepped
    # bit-identity contract path; n_batches % unroll != 0 still works.
    epoch_scan_unroll: int = 1
    # XLA matmul precision. Measured on the v5e at the production shape
    # (B=256/T=354; parity from bench.py onchip_parity post-r4
    # Newton-refined logs, timing from the r4 one-session frontier sweep):
    #   "high"    (bf16_3x) — vs-torch 1.066e-4, 624 us/step  <- default
    #   "highest" (f32)     — vs-torch 5.1e-5,   753 us/step
    #   "default" (bf16)    — vs-torch 3.5e-2,   520 us/step
    # The ~1e-4 "high" envelope splits between bf16_3x rounding inside the
    # biLSTM recurrence and chip-exp ulps on the CCI intensities; "highest"
    # removes the matmul term at ~21% step cost (and the recurrence is
    # where ALL of that cost lives — selective LSTM-only f32 measured
    # identical to whole-model "highest", PARITY.md r4). Both pass the
    # bench's 2.5e-4 on-chip gate; the CPU parity suite is unaffected (CPU
    # ignores this knob, always f32). Set "default" for peak throughput
    # when parity doesn't matter.
    matmul_precision: str = "high"
    # matmul precision for EVAL/DUMP forwards (train=False) — the parity
    # surfaces users actually consume (latent dumps, DEC delta eval, valid
    # losses). Default "highest" (full f32): eval is a tiny share of wall
    # (one fused eval per boundary, dumps once per run; measured eval-epoch
    # delta in PARITY.md r5) and it puts the on-chip latent at ~5.1e-5 vs
    # torch instead of "high"'s ~1.1e-4 — train throughput is untouched
    # because the train step never sees this knob (models/net.forward
    # branches on `train`). On TPU this shifts valid losses ~1e-4-scale vs
    # a "high" eval, so checkpoint metric selection and the DEC delta
    # trajectory can differ from a pre-r5 run (document, not a contract:
    # both knobs are no-ops on the f32 CPU backend where the bit-identity
    # suites run). Set equal to matmul_precision to restore the old
    # one-knob behavior.
    eval_matmul_precision: str = "highest"
    # PRNG implementation for the trainer's root key (every draw in a run
    # — augmentation noise, fake-select bits, dropout, param init —
    # descends from it and inherits the impl). "threefry2x32" (JAX default)
    # is counter-based and fully deterministic across backends, shardings
    # and topologies. "rbg" rides the TPU hardware RNG: the step's ~2.8M
    # draws cost 200 -> 71 us (benchmarks/rng_ab.py), worth ~8-12% step
    # throughput at the production shape — but XLA's RngBitGenerator is
    # only reproducible per (backend, topology), so the sharded-vs-single
    # bit-match guarantee and cross-backend replay do NOT hold under it.
    # Parity contracts are unaffected (eval forward draws nothing).
    prng_impl: str = "threefry2x32"
    # bit width of the step's big (B, C, T) random draws (augmentation
    # normals, fake-select keys, fake-noise uniforms — together ~92% of the
    # step's ~3.3M threefry words). 16 halves the threefry bit-generation
    # while keeping its determinism guarantees; the fake-select subset
    # gains a ~T/2^16-per-row early-position tie bias (~0.5% of rows at
    # T=354 — see data/loader.py; the 32-bit path carries the same bias
    # at ~32x rarer). But
    # MEASURED WALL-NEUTRAL on the real chip (benchmarks/drawbits_ab.py,
    # interleaved min-of-reps at B=256/T=354: 703.4 vs 702.3 us/step, an
    # earlier rep 663.7 vs 645.9 — inside noise) because the draws already
    # overlap with compute, and actively SLOWER under prng_impl="rbg"
    # (488.1 -> 558.5 us/step: the hardware RNG is 32-bit-native, so the
    # narrow path just adds conversions). Keep 32; the option stays as the
    # measured record + for draw-bound experiment variants.
    rng_draw_bits: int = 32
    # forward-pass compute dtype. float32 is both the parity requirement
    # AND the measured-fastest choice on v5e for this model (the hot ops
    # are VPU-bound logsumexp chains and R=6-step LSTMs, not big MXU
    # matmuls; bf16 measured 2.3ms -> 4.4ms/step at B=256). bfloat16 stays
    # available for memory-constrained or MXU-dominated variants.
    compute_dtype: str = "float32"
    # One-flag performance preset bundling the measured knob combinations
    # (PARITY.md frontier tables) so users don't reassemble them by hand:
    #   ""       — no preset; the individual knobs apply as set.
    #   "parity" — unroll=1, threefry, matmul "high": the default contract
    #              surface (fused==stepped bit-identity, sharded-vs-single
    #              bit-match, machine-checked on-chip torch agreement).
    #   "tuned"  — unroll=4, prng_impl="rbg", matmul "high": the measured
    #              fast config that KEEPS on-chip torch parity but gives up
    #              the bit-identity contracts (unroll shifts gradient
    #              reduction order ~4e-5 over 5 Adam steps; rbg is only
    #              reproducible per backend/topology).
    #   "peak"   — "tuned" plus matmul "default" (plain bf16 matmuls):
    #              fastest measured; FAILS the vs-torch gate (~3.5e-2 at
    #              T=354) — benchmarking/exploration only.
    # The preset STOMPS epoch_scan_unroll / prng_impl / matmul_precision /
    # eval_matmul_precision (parity+tuned pin eval at "highest"; peak pins
    # "default") — a conflicting explicit flag loses; the application is
    # logged.
    perf_profile: str = ""

    # ------------------------------------------------------------------
    @property
    def dim_enc_hidden(self) -> int:
        """Latent width: concat of fwd/bwd final LSTM hidden states."""
        return 2 * self.lstm_hidden

    @property
    def loss_components(self) -> frozenset:
        """Decode the reference's loss-mode string into a component set.

        The reference dispatches on 9 loss-name strings with elif chains
        (pretrain_trainer.py:197-221, clustering_trainer.py:228-272); here the
        mode string is parsed once into data.
        """
        name = self.loss
        comps = set()
        if "_sup" in name:
            comps.add("sup")
        if "fake_detect" in name:
            comps.add("fake")
        if name.endswith("_kl") or "_kl_" in name:
            comps.add("kl")
        if "triplet" in name:
            comps.add("triplet")
        return frozenset(comps)

    # enum-valued fields: validated at construction so a typo'd flag fails
    # at the CLI boundary with the valid options, not as a deep trace/XLA
    # error thousands of frames in (rng_draw_bits=8, for instance, would
    # otherwise silently behave as 32 — data/loader.py dispatches on == 16)
    _CHOICES = {
        "mode": ("train", "eval"),
        "optimizer": ("adam", "sgd", "rmsprop"),
        "lr_decay_mode": ("step", "plateau", "warmup"),
        "matmul_precision": ("highest", "high", "default"),
        "eval_matmul_precision": ("highest", "high", "default"),
        "prng_impl": ("threefry2x32", "rbg"),
        "rng_draw_bits": (32, 16),
        "stopping_mode": ("delta", "count", "patience"),
        "kmeans_impl": ("device", "sklearn"),
        "feat_dump": ("full", "lean"),
        "dbscan_impl": ("device", "sklearn"),
        "perf_profile": ("", "parity", "tuned", "peak"),
    }
    # the knob bundle each perf_profile pins (see the field's docstring)
    _PROFILES = {
        "parity": {
            "epoch_scan_unroll": 1,
            "prng_impl": "threefry2x32",
            "matmul_precision": "high",
            "eval_matmul_precision": "highest",
        },
        "tuned": {
            "epoch_scan_unroll": 4,
            "prng_impl": "rbg",
            "matmul_precision": "high",
            "eval_matmul_precision": "highest",
        },
        "peak": {
            "epoch_scan_unroll": 4,
            "prng_impl": "rbg",
            "matmul_precision": "default",
            "eval_matmul_precision": "default",
        },
    }
    # contract trade-off lines printed when a profile is applied
    _PROFILE_NOTES = {
        "parity": "all contracts hold (bit-identity, sharded-vs-single, "
                  "machine-checked on-chip torch agreement)",
        "tuned": "KEEPS on-chip torch parity; gives up fused==stepped "
                 "bit-identity (unroll=4 shifts gradient reduction order "
                 "~4e-5/5 Adam steps) and cross-topology RNG replay (rbg)",
        "peak": "FAILS the vs-torch parity gate (~3.5e-2 at T=354, plain "
                "bf16 matmuls) — benchmarking/exploration only",
    }
    _MIN_ONE = ("eval_interval", "epoch_scan_unroll", "batch_size",
                "num_timestamps", "max_epochs")

    def __post_init__(self):
        if self.perf_profile:
            knobs = self._PROFILES[self.perf_profile] \
                if self.perf_profile in self._PROFILES else None
            if knobs is not None:
                # warn only for values that are neither the profile's nor
                # the field default — i.e. something the caller set on
                # purpose (an untouched default being re-pinned is routine)
                defaults = {
                    f.name: f.default for f in dataclasses.fields(self)
                }
                stomped = {
                    k: getattr(self, k) for k, v in knobs.items()
                    if getattr(self, k) not in (v, defaults[k])
                }
                for k, v in knobs.items():
                    setattr(self, k, v)
                import logging

                log = logging.getLogger("dicl")
                log.info(
                    "perf_profile=%r: %s — %s",
                    self.perf_profile,
                    ", ".join(f"{k}={v!r}" for k, v in knobs.items()),
                    self._PROFILE_NOTES[self.perf_profile],
                )
                if stomped:
                    log.warning(
                        "perf_profile=%r overrode explicitly-set %s (the "
                        "profile wins; drop --perf_profile to hand-tune)",
                        self.perf_profile,
                        ", ".join(f"{k}={v!r}" for k, v in stomped.items()),
                    )
        for name, allowed in self._CHOICES.items():
            v = getattr(self, name)
            if v not in allowed:
                raise ValueError(
                    f"Config.{name}={v!r}: must be one of {allowed}"
                )
        for name in self._MIN_ONE:
            if getattr(self, name) < 1:
                raise ValueError(
                    f"Config.{name}={getattr(self, name)} must be >= 1"
                )
        if self.use_pallas and self.use_pallas_bwd:
            raise ValueError(
                "use_pallas and use_pallas_bwd are mutually exclusive: the "
                "Pallas-forward path carries its own (XLA-replay) VJP, so "
                "the fused backward would silently not run"
            )
        if self.k_max < 2:
            # the K sweeps run 2..k_max; an empty sweep crashes the gap
            # summary far from the flag that caused it
            raise ValueError(f"Config.k_max={self.k_max} must be >= 2")

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    # fields that determine parameter/data shapes: overriding one while
    # reloading a run's config makes its checkpoints/dumps incompatible
    # (the reference's load_config forbids ALL overrides outside a tiny
    # whitelist, utils.py:44-57 — here any override is allowed, so the
    # shape-bearing ones at least warn)
    _SHAPE_BEARING = (
        "num_timestamps", "num_variables", "ref_points", "lstm_hidden",
        "head_hidden", "cluster_number", "fake_detection", "aux_tasks",
    )

    # per-process runtime topology: a rank and a coordinator host:port are
    # meaningful only for the launch that set them — reloading them via
    # `--config` would make a later single-process run block in
    # jax.distributed.initialize waiting on peers that never start (and a
    # re-launched multi-host run would give every rank process_id 0)
    _RUNTIME_ONLY = ("num_processes", "process_id", "coordinator_address")

    # ---- (de)serialization --------------------------------------------
    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        for k in self._RUNTIME_ONLY:
            d.pop(k, None)
        return json.dumps(d, indent=2, sort_keys=True)

    def save(self, run_dir: str, name: str = "config") -> str:
        os.makedirs(run_dir, exist_ok=True)
        path = os.path.join(run_dir, f"{name}.json")
        with open(path, "w") as f:
            f.write(self.to_json())
        return path

    @classmethod
    def load(cls, path: str, **overrides) -> "Config":
        """Reload a saved config, overriding a changeable subset.

        Mirrors `load_config` (reference utils.py:44-57): every stored field
        is restored, then the caller-supplied overrides win.
        """
        with open(path) as f:
            d = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        known -= set(cls._RUNTIME_ONLY)  # configs saved before the exclusion
        d = {k: v for k, v in d.items() if k in known}
        shape_changed = {
            k: (d[k], v) for k, v in overrides.items()
            if k in cls._SHAPE_BEARING and k in d and d[k] != v
        }
        if shape_changed:
            import logging

            logging.getLogger("dicl").warning(
                "Config.load(%s): overriding shape-bearing %s — checkpoints "
                "and feature dumps written under the stored value will NOT "
                "load/compare against this run (reference utils.py:44-57 "
                "forbids such overrides outright)",
                path,
                ", ".join(
                    f"{k}: {old!r} -> {new!r}"
                    for k, (old, new) in shape_changed.items()
                ),
            )
        d.update(overrides)
        # JSON round-trips tuples as lists — coerce back for every
        # tuple-defaulted field, not a hardcoded name list
        for f in dataclasses.fields(cls):
            default = (
                f.default_factory()  # type: ignore[misc]
                if f.default_factory is not dataclasses.MISSING  # type: ignore[misc]
                else f.default
            )
            if isinstance(default, tuple) and isinstance(d.get(f.name), list):
                d[f.name] = tuple(d[f.name])
        return cls(**d)
