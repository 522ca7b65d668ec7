"""1M-encounter IN-PROCESS pipeline: p1 epochs → device-resident latents →
K-selection elbow → DEC (p3) → final aligned labels (p4), composed through
the framework API with the analytics consuming latents that never leave
the chip.

The CLI stages interchange through feature files (reference semantics);
at 1M encounters the file dumps alone push ~1 GB of latents over a
1-15 MB/s tunneled D2H link. This benchmark demonstrates the TPU-native
composition the framework supports instead: `eval_one_epoch(
device_dumps=True)` feeds KSelection.elbow / the DEC center init /
kmeans-based final labeling directly on device — only centers, scalar
metrics and the final int labels ever reach the host.

Notes on scope (honest limits, not shortcuts):
  * The gap statistic's inertias are O(n²) pairwise sweeps by definition
    (reference p2_clustering_optK.py:334-351) — at 700k train encounters
    that is ~5e14 FLOPs per (k, draw) and impractical in ANY framework;
    K-selection at this scale uses the O(n·k) elbow (reference p2:254-274).
  * Final labeling mirrors FinalLabeler._pred_kmeans (cluster/final.py:90-
    115) inline: same fit → SBP align → per-cohort predict, minus the
    .npy dump writes whose D2H is exactly what this path avoids.

Prints one JSON line per stage. Usage:
  python benchmarks/scale_1m_pipeline.py [--n 1000000] [--max_obs 48]
      [--batch_size 4096] [--dec_epochs 4] [--k 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.cluster import KSelection, generate_align_map
from deep_interpolation_clustering_tpu.cluster.kmeans import (
    fit_kmeans_impl,
    kmeans_predict,
)
from deep_interpolation_clustering_tpu.data import (
    ArrayDataset,
    make_synthetic_cohorts,
    process_splits,
)
from deep_interpolation_clustering_tpu.train import ClusterTrainer, Trainer
from deep_interpolation_clustering_tpu.train import checkpoint as ckpt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--max_obs", type=int, default=48)
    ap.add_argument("--batch_size", type=int, default=4096)
    ap.add_argument("--dec_epochs", type=int, default=4)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--k_max", type=int, default=6)
    # seeded-subsample gap statistic (Config.gap_subsample): the exact
    # inertias are O(n²) and impractical at 700k train rows, but the
    # subsampled estimator restores the K-selection signal the 1M pipeline
    # previously forfeited. 0 = skip.
    ap.add_argument("--gap_subsample", type=int, default=20_000)
    ap.add_argument("--gap_b", type=int, default=3)
    ap.add_argument("--root", default="/tmp/scale_1m")
    args = ap.parse_args()

    t0 = time.time()
    cohorts = process_splits(
        make_synthetic_cohorts(n_total=args.n, max_obs=args.max_obs),
        rng=np.random.RandomState(0),
    )
    print(json.dumps({"metric": "p0_seconds", "value": round(time.time() - t0, 1),
                      "n": args.n, "t": args.max_obs}), flush=True)

    base = dict(
        batch_size=args.batch_size, num_timestamps=args.max_obs,
        log_train_freq=10_000, log_valid_freq=10_000, early_stopping=10_000,
        epoch_scan_unroll=4, cluster_number=args.k, kmeans_n_init=20,
        k_max=args.k_max, n_init=3,
    )

    # ---- p1: two epochs + warmstart checkpoint for the p1->p3 handoff
    p1_path = os.path.join(args.root, "Pretrain")
    cfg1 = Config(max_epochs=3, **base)
    ds1 = {c: ArrayDataset(cfg1, d, c) for c, d in cohorts.items()}
    tr1 = Trainer(cfg1, ds1, p1_path, use_tensorboard=False)
    tr1.train_one_epoch(ds1["training"], denoise=False)  # compiles
    t0 = time.time()
    tr1.epoch += 1
    tr1.train_one_epoch(ds1["training"], denoise=False)
    n_train = len(ds1["training"])
    dt = time.time() - t0
    print(json.dumps({"metric": "p1_epoch_seconds", "value": round(dt, 2),
                      "encounters_per_sec": round(n_train / dt, 1)}), flush=True)
    ckpt.save_checkpoint(
        os.path.join(tr1.weight_paths[cfg1.restore_metric], ckpt.CKPT_NAME),
        tr1.epoch, tr1.params, tr1.state, tr1.opt_state,
        extra={"metric": "warmstart"},
    )

    # ---- device-resident latent extraction over the 700k train encounters
    # warm BOTH eval programs (train/valid scan lengths compile separately)
    # so the timed section below measures execution, not one-time compiles
    for scope, ds_w in (("train", ds1["training"]), ("valid", ds1["validation"])):
        _, warm = tr1.eval_one_epoch(scope, ds_w, False,
                                     dump_keys=("hidden",), device_dumps=True)
        jax.block_until_ready(warm["hidden"][0])
    t0 = time.time()
    _, dumps = tr1.eval_one_epoch("train", ds1["training"], False,
                                  dump_keys=("hidden",), device_dumps=True)
    train_h = jax.block_until_ready(dumps["hidden"][0])
    _, vdumps = tr1.eval_one_epoch("valid", ds1["validation"], False,
                                   dump_keys=("hidden",), device_dumps=True)
    valid_h = jax.block_until_ready(vdumps["hidden"][0])
    print(json.dumps({
        "metric": "latent_extract_seconds_device",
        "value": round(time.time() - t0, 2),
        "train_shape": list(train_h.shape), "valid_shape": list(valid_h.shape),
    }), flush=True)
    tr1.close()
    del tr1, ds1  # free the first trainer's HBM-resident planes before p3

    # ---- p2: elbow K-selection directly on the device latents
    t0 = time.time()
    sel = KSelection(Config(**base), os.path.join(args.root, "optk"))
    out = sel.elbow(train_h, valid_h, plot=False)
    print(json.dumps({"metric": "p2_elbow_seconds",
                      "value": round(time.time() - t0, 1),
                      "elbow_k": out["elbow_k"], "k_max": args.k_max}), flush=True)

    # ---- p2: subsampled gap statistic on the device latents
    if args.gap_subsample:
        cfg_gap = Config(**base).replace(
            gap_subsample=args.gap_subsample, gap_b=args.gap_b
        )
        t0 = time.time()
        gap = KSelection(cfg_gap, os.path.join(args.root, "optk")).gap_statistic(
            train_h, version=1, plot=False
        )
        print(json.dumps({
            "metric": "p2_gap_subsample_seconds",
            "value": round(time.time() - t0, 1),
            "gap_subsample": args.gap_subsample, "gap_b": args.gap_b,
            "opt_k": gap["opt_k"], "opt_k_argmax": gap["opt_k_argmax"],
        }), flush=True)
    del train_h, valid_h, dumps, vdumps, warm

    # ---- p3: DEC center init (device path) + joint epochs + delta eval
    p3_path = os.path.join(args.root, "Clustering")
    cfg3 = Config(max_epochs=args.dec_epochs, loss="ae_mse_sup_fake_detect_kl",
                  **base)
    ds3 = {c: ArrayDataset(cfg3, d, c) for c, d in cohorts.items()}
    tr3 = ClusterTrainer(cfg3, ds3, p3_path, pretrain_exp_path=p1_path,
                         use_tensorboard=False)
    t0 = time.time()
    valid_prev = tr3.init_centers()
    print(json.dumps({"metric": "p3_center_init_seconds",
                      "value": round(time.time() - t0, 1),
                      "kmeans_n_init": cfg3.kmeans_n_init}), flush=True)

    deltas, epoch_s, eval_s = [], [], []
    for e in range(args.dec_epochs):
        t0 = time.time()
        tr3.train_one_epoch(ds3["training"], denoise=False)
        t1 = time.time()
        delta, _, valid_prev, _ = tr3.generate_pred_cluster(
            "valid", ds3["validation"], valid_prev
        )
        t2 = time.time()
        deltas.append(round(delta, 5))
        if e > 0:  # first iteration pays the compiles
            epoch_s.append(t1 - t0)
            eval_s.append(t2 - t1)
        tr3.epoch += 1
    print(json.dumps({
        "metric": "p3_dec_epoch_seconds",
        "value": round(float(np.median(epoch_s)), 2) if epoch_s else None,
        "delta_eval_seconds": round(float(np.median(eval_s)), 2) if eval_s else None,
        "delta_trajectory": deltas,
    }), flush=True)

    # ---- p4: final labels from device latents (mirrors final.py:90-115)
    t0 = time.time()
    feats = {c: tr3.generate_pretrain_feat(c)
             for c in ("training", "validation", "testing")}
    result = fit_kmeans_impl(cfg3, cfg3.seed, feats["training"],
                             args.k, n_init=cfg3.kmeans_n_init)
    train_raw = np.asarray(kmeans_predict(result.centers, feats["training"]))
    train_ds = ds3["training"]
    align_map, _, _ = generate_align_map(
        train_raw, train_ds.ob, train_ds.padding_mask
    )
    centers = np.asarray(result.centers)
    aligned = centers.copy()
    for org_id, new_id in align_map.items():
        aligned[new_id] = centers[org_id]
    sizes = {}
    for cohort, h in feats.items():
        labels = np.asarray(kmeans_predict(jax.numpy.asarray(aligned), h))
        sizes[cohort] = int(labels.shape[0])
    print(json.dumps({"metric": "p4_label_seconds",
                      "value": round(time.time() - t0, 1),
                      "align_map": {int(k): int(v) for k, v in align_map.items()},
                      "cohorts": sizes}), flush=True)
    tr3.close()


if __name__ == "__main__":
    main()
