"""p3 (DEC) + p4 (final labeling) at the 100k-encounter production scale.

Closes the scaled-measurement gap: scale_100k.py covers p0/p1 epochs, latent
extraction and the gap statistic; this script measures the remaining
pipeline stages at 100k/T=354 on the real chip —

  * p3 phase 1: k-means center init over the 100k training latents
    (latent extract + on-device k-means, n_init as configured);
  * p3 phase 2: DEC joint epochs (KL + pretrain losses) INCLUDING the
    per-epoch validation delta eval, run to delta-stopping or --max_epochs;
  * p4: final labels for all three cohorts (k-means fit at 100k, SBP
    alignment, per-cohort predict + dump writes).

A short p1 warmstart (one epoch) provides the pretrain checkpoint the DEC
init restores, exactly like the production p1->p3 handoff
(reference clustering_trainer.py:431-447).

Prints one JSON line per stage. Usage:
  python benchmarks/scale_p3p4.py [--n 100000] [--max_obs 354]
      [--batch_size 256] [--max_epochs 6] [--kmeans_n_init 20]

Cadence A/B (`--loop_epochs N`): full ClusterTrainer.train() runs at
eval_interval 1 / --loop_interval, the latter with pipeline_delta
off/on. Interpretation note (PARITY.md r5): wall/epoch carries a
~3.7 s once-per-run compile+boundary cost — run TWO lengths (e.g.
--only_loop --loop_epochs 24 --stopping_mode delta vs a stopping run)
and solve for the steady-state slope before attributing overheads.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from _harness import cached_synthetic_cohorts  # noqa: E402

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.cluster import FinalLabeler
from deep_interpolation_clustering_tpu.data import ArrayDataset
from deep_interpolation_clustering_tpu.train import ClusterTrainer, Trainer
from deep_interpolation_clustering_tpu.train import checkpoint as ckpt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--max_obs", type=int, default=354)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--max_epochs", type=int, default=6)
    ap.add_argument("--kmeans_n_init", type=int, default=20)
    ap.add_argument("--cluster_number", type=int, default=4)
    ap.add_argument("--feat_dump", default="full", choices=("full", "lean"))
    ap.add_argument("--warmstart_epochs", type=int, default=1)
    ap.add_argument("--root", default="/tmp/scale_p3p4")
    # ---- full-loop cadence A/B (Config.eval_interval in the DEC loop):
    # run ClusterTrainer.train() end-to-end at eval_interval=1 (the
    # reference cadence: per-epoch loss fetch + aly_pred) and at
    # --loop_interval (deferred: one changed-label scalar per epoch), same
    # epoch budget, and report wall/epoch + the delta trajectories (must
    # be identical — the deferral moves fetches, not math). 0 = skip.
    ap.add_argument("--loop_epochs", type=int, default=0)
    ap.add_argument("--loop_interval", type=int, default=8)
    # stopping rule for the loop runs (the manual timing loop keeps the
    # reference delta rule): e.g. --stopping_mode patience actually STOPS
    # at 100k where the reference's 1e-4 delta provably never fires
    ap.add_argument("--stopping_mode", default="delta",
                    choices=("delta", "count", "patience"))
    ap.add_argument("--stopping_count", type=int, default=0)
    ap.add_argument("--stopping_patience", type=int, default=20)
    # loop-A/B iteration mode: skip the manual epoch timing, feature
    # dumps and p4 (the slow tail) — measure only the full-loop cadences
    ap.add_argument("--only_loop", action="store_true")
    args = ap.parse_args()

    from deep_interpolation_clustering_tpu.cli.common import (
        enable_compilation_cache,
    )

    enable_compilation_cache(Config())

    # synthetic p0, /tmp-cached across benchmark reruns (shared helper —
    # one copy of the cache format between scale_100k and this script)
    cohorts, p0_s, cached = cached_synthetic_cohorts(args.n, args.max_obs)
    rec = {"metric": "p0_seconds", "value": round(p0_s, 1),
           "n": args.n, "t": args.max_obs}
    if cached:
        rec["cached"] = True
    print(json.dumps(rec))

    base = dict(
        batch_size=args.batch_size, num_timestamps=args.max_obs,
        log_train_freq=100_000, log_valid_freq=100_000, early_stopping=10_000,
        kmeans_n_init=args.kmeans_n_init, cluster_number=args.cluster_number,
        num_clusters=args.cluster_number, feat_dump=args.feat_dump,
    )

    # ---- p1 warmstart: N epochs + a checkpoint for the DEC init to load.
    # --warmstart_epochs matters for the DEC delta trajectory: with 1
    # epoch the latents keep reorganizing under KL and the 1e-4 delta
    # stop never fires (measured to 400 epochs, PARITY.md); a properly
    # pretrained handoff is the production p1->p3 shape.
    p1_path = os.path.join(args.root, "Pretrain")
    cfg1 = Config(max_epochs=args.warmstart_epochs + 1, **base)
    ds1 = {c: ArrayDataset(cfg1, d, c) for c, d in cohorts.items()}
    t0 = time.time()
    tr1 = Trainer(cfg1, ds1, p1_path, use_tensorboard=False)
    for _ in range(args.warmstart_epochs):
        tr1.train_one_epoch(ds1["training"], denoise=False)
        tr1.epoch += 1
    ckpt.save_checkpoint(
        os.path.join(tr1.weight_paths[cfg1.restore_metric], ckpt.CKPT_NAME),
        tr1.epoch, tr1.params, tr1.state, tr1.opt_state,
        extra={"metric": "warmstart"},
    )
    tr1.close()
    print(json.dumps({"metric": "p1_warmstart_seconds",
                      "value": round(time.time() - t0, 1),
                      "epochs": args.warmstart_epochs}))

    # ---- p3: DEC
    p3_path = os.path.join(args.root, "Clustering")
    cfg3 = Config(
        max_epochs=args.max_epochs, loss="ae_mse_sup_fake_detect_kl", **base
    )
    if not args.only_loop:
        ds3 = {c: ArrayDataset(cfg3, d, c) for c, d in cohorts.items()}
        tr3 = ClusterTrainer(cfg3, ds3, p3_path, pretrain_exp_path=p1_path,
                             use_tensorboard=False)

        t0 = time.time()
        valid_prev = tr3.init_centers()  # latent extract @100k + kmeans fit
        print(json.dumps({"metric": "p3_center_init_seconds",
                          "value": round(time.time() - t0, 1),
                          "kmeans_n_init": args.kmeans_n_init}))

        # warm the train-epoch + delta-eval programs, then time DEC epochs
        deltas, epoch_s, eval_s = [], [], []
        for e in range(args.max_epochs):
            t0 = time.time()
            tr3.train_one_epoch(ds3["training"], denoise=False)
            t1 = time.time()
            delta, _, valid_pred, _ = tr3.generate_pred_cluster(
                "valid", ds3["validation"], valid_prev
            )
            t2 = time.time()
            valid_prev = valid_pred
            deltas.append(round(delta, 5))
            if e > 0:  # first iteration pays the compiles
                epoch_s.append(t1 - t0)
                eval_s.append(t2 - t1)
            tr3.epoch += 1
            if cfg3.stopping_delta is not None and delta < cfg3.stopping_delta:
                break
        print(json.dumps({
            "metric": "p3_dec_epoch_seconds",
            "value": round(float(np.median(epoch_s)), 2) if epoch_s else None,
            "delta_eval_seconds": round(float(np.median(eval_s)), 2) if eval_s else None,
            "epochs_run": len(deltas), "delta_trajectory": deltas,
            "stopping_delta": cfg3.stopping_delta,
        }))

    # ---- full-loop cadence A/B + scaled stopping demonstration
    if args.loop_epochs:
        # pipeline_delta only changes the deferred cadence (lagged scalar
        # fetch + rollback-on-stop) — A/B it at the deferred interval; the
        # reference-cadence arm records pipeline_delta=False (the flag is
        # inert at eval_interval=1, so labeling it on would misrepresent
        # the measurement)
        for interval, piped in (
            (1, False), (args.loop_interval, False), (args.loop_interval, True),
        ):
            cfgL = Config(
                max_epochs=args.loop_epochs,
                loss="ae_mse_sup_fake_detect_kl",
                eval_interval=interval,
                pipeline_delta=piped,
                stopping_mode=args.stopping_mode,
                stopping_count=args.stopping_count,
                stopping_patience=args.stopping_patience,
                **base,
            )
            dsL = {c: ArrayDataset(cfgL, d, c) for c, d in cohorts.items()}
            trL = ClusterTrainer(
                cfgL, dsL,
                os.path.join(args.root, f"loop{interval}{'p' if piped else ''}"),
                pretrain_exp_path=p1_path, use_tensorboard=False,
            )
            t0 = time.time()
            prev = trL.init_centers()
            t_init = time.time() - t0
            trL.init_centers = lambda _p=prev: _p  # train() skips the re-init
            t0 = time.time()
            trL.train()
            wall = time.time() - t0
            epochs_run = len(trL.delta_history)
            print(json.dumps({
                "metric": "p3_loop_wall_per_epoch_seconds",
                "value": round(wall / max(epochs_run, 1), 3),
                "eval_interval": interval,
                "pipeline_delta": piped,
                "epochs_run": epochs_run,
                "stopped_early": epochs_run < args.loop_epochs - 1,
                "stopping_mode": args.stopping_mode,
                "center_init_seconds": round(t_init, 1),
                "delta_trajectory": [round(d, 5) for d in trL.delta_history],
            }))
            trL.close()

    if args.only_loop:
        return

    # feature dumps for p4 (the p3 CLI writes these via eval(generate_feat))
    t0 = time.time()
    for m in ("delta",):
        for cohort in ("training", "validation", "testing"):
            tr3.eval(cohort, generate_feat=True, metric=m)
    print(json.dumps({"metric": "p3_feature_dump_seconds",
                      "value": round(time.time() - t0, 1),
                      "feat_dump": args.feat_dump}))
    tr3.close()

    # ---- p4: final labels (kmeans fit @100k + SBP align + 3 dumps)
    t0 = time.time()
    labeler = FinalLabeler(cfg3, p3_path)
    results = labeler.pred(metrics=["delta"], seed=cfg3.seed)
    sizes = {c: int(len(v)) for c, v in results["delta"].items()}
    print(json.dumps({"metric": "p4_label_seconds",
                      "value": round(time.time() - t0, 1), "cohorts": sizes}))


if __name__ == "__main__":
    main()
