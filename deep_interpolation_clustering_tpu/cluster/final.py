"""p4 — final cluster labels (kmeans / dbscan / consensus / dl paths).

Re-expression of the reference's final-labeling stage
(p4_clustering_final.py:43-309) over the framework's feature dumps:
  * `kmeans` — on-device k-means (n_init=20) on training latents, centers
    permuted by the SBP-descending align map, every cohort relabeled with
    the aligned centers.
  * `dbscan` — per-cohort sklearn DBSCAN at `opt_eps`; training aligned by
    SBP, valid/test aligned to the training centroids by nearest-center
    bijection.
  * `consensus` — external consensus labels (CSV column `k{K}`), re-mapped
    through the training align map.
  * `dl` — argmax of DEC's `cluster_pred`/`cluster_label` probabilities
    (the reference's loader drops those keys and would KeyError,
    p4:54 vs :294-296; our dumps retain them).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..parallel import is_main_process

from ..config import Config
from ..info import COHORTS
from ..utils import logger
from .align import align_labels, align_labels_with_center, generate_align_map
from .kmeans import fit_kmeans_impl, kmeans_predict
from .optk import dbscan_quality

LOAD_KEYS = ("encounter_id", "hidden", "ob", "padding_mask")
DL_KEYS = ("cluster_pred", "cluster_label")


def load_feature_dumps(feat_path: str, dl_keys: bool = False) -> Dict[str, Dict]:
    """Load `{cohort}.npy` dicts, keeping the keys p4 needs — including the
    DEC probability keys for the 'dl' path (fixing reference p4:54)."""
    out = {}
    keys = LOAD_KEYS + (DL_KEYS if dl_keys else ())
    for cohort in COHORTS:
        full = np.load(
            os.path.join(feat_path, f"{cohort}.npy"), allow_pickle=True
        ).item()
        out[cohort] = {k: full[k] for k in keys if k in full}
        logger.info("cohort %s: %d samples", cohort, len(out[cohort]["encounter_id"]))
    return out


class FinalLabeler:
    def __init__(self, cfg: Config, exp_path: str):
        self.cfg = cfg
        self.exp_path = exp_path

    def _out_path(self, metric: str) -> str:
        p = os.path.join(
            self.exp_path, "out_feat", f"{metric}_{self.cfg.cluster_method}_aligned"
        )
        os.makedirs(p, exist_ok=True)
        return p

    def pred(
        self, metrics: Optional[List[str]] = None, seed: int = 0
    ) -> Dict[str, Dict[str, np.ndarray]]:
        """Run the configured label path for each restore metric; returns
        {metric: {cohort: labels}} and writes `{cohort}_{K}.npy` dumps."""
        cfg = self.cfg
        results: Dict[str, Dict[str, np.ndarray]] = {}
        metrics = metrics or ["ae_mse", "loss", "delta"]
        for metric in metrics:
            feat_path = os.path.join(self.exp_path, "out_feat", metric)
            data = load_feature_dumps(feat_path, dl_keys=cfg.cluster_method == "dl")
            out_path = self._out_path(metric)
            method = cfg.cluster_method
            if method == "kmeans":
                results[metric] = self._pred_kmeans(data, out_path, seed)
            elif method == "dbscan":
                results[metric] = self._pred_dbscan(data, out_path)
            elif method == "consensus":
                results[metric] = self._pred_consensus(data, out_path)
            elif method == "dl":
                results[metric] = self._pred_dl(data, out_path)
            else:
                raise ValueError(f"unknown cluster_method {method!r}")
        return results

    # ------------------------------------------------------------ kmeans
    def _pred_kmeans(self, data, out_path: str, seed: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        opt_k = cfg.num_clusters
        train = data["training"]
        result = fit_kmeans_impl(
            cfg, seed, train["hidden"], opt_k, n_init=cfg.kmeans_n_init
        )
        train_raw = np.asarray(kmeans_predict(result.centers, train["hidden"]))
        align_map, _, _ = generate_align_map(
            train_raw, train["ob"], train["padding_mask"]
        )
        centers = np.asarray(result.centers).copy()
        aligned_centers = centers.copy()
        for org_id, new_id in align_map.items():
            aligned_centers[new_id] = centers[org_id]

        out = {}
        for cohort in COHORTS:
            d = dict(data[cohort])
            labels = np.asarray(kmeans_predict(aligned_centers, d["hidden"]))
            d["cluster_id"] = labels
            d.pop("ob", None)
            d.pop("padding_mask", None)
            if is_main_process():  # multi-host: single writer
                np.save(os.path.join(out_path, f"{cohort}_{opt_k}.npy"), d)
            out[cohort] = labels
        return out

    # ------------------------------------------------------------ dbscan
    def _pred_dbscan(self, data, out_path: str) -> Dict[str, np.ndarray]:
        from .dbscan import fit_dbscan_impl

        cfg = self.cfg
        out = {}
        train_centers = None
        for cohort in COHORTS:
            d = dict(data[cohort])
            feat = d["hidden"]
            raw, _ = fit_dbscan_impl(cfg, feat, cfg.opt_eps, feat.shape[-1])
            if (raw < 0).all():
                # every point noise -> no clusters to align; a deep stack
                # error from the aligner explains nothing to the user
                raise ValueError(
                    f"dbscan found 0 clusters on '{cohort}' at "
                    f"eps={cfg.opt_eps}, min_samples={feat.shape[-1]} "
                    f"({len(feat)} rows): raise --opt_eps (use the p2 "
                    "k-distance knee) or use a larger cohort"
                )
            if cohort == "training":
                _, aligned, train_centers = generate_align_map(
                    raw, d["ob"], d["padding_mask"], feat
                )
            else:
                aligned = align_labels_with_center(feat, raw, train_centers)
            d["cluster_id"] = aligned
            # final-label quality: cluster/noise counts + silhouette with
            # and without noise (reference p4_clustering_final.py:209-233)
            quality = dbscan_quality(feat, aligned)
            logger.info("dbscan %s quality: %s", cohort, quality)
            d.pop("ob", None)
            d.pop("padding_mask", None)
            if is_main_process():  # multi-host: single writer
                np.save(os.path.join(out_path, f"{cohort}_eps-{cfg.opt_eps}.npy"), d)
            out[cohort] = aligned
        return out

    # --------------------------------------------------------- consensus
    def _pred_consensus(self, data, out_path: str) -> Dict[str, np.ndarray]:
        """External consensus labels re-mapped through the training align
        map (reference p4:241-287; training+validation only, as there)."""
        import pandas as pd

        cfg = self.cfg
        opt_k = cfg.num_clusters
        raw_dir = os.path.join(self.exp_path, "out_feat", "raw_consensus_result")

        def read(cohort):
            df = pd.read_csv(os.path.join(raw_dir, f"{cohort}_consensus.csv"))
            lbl = df[f"k{opt_k}"].values.copy()
            if not np.any(lbl == 0):
                lbl -= 1  # 1-based -> 0-based
            return lbl

        train = data["training"]
        raw_labels = {"training": read("training"), "validation": read("validation")}
        align_map, _, _ = generate_align_map(
            raw_labels["training"], train["ob"], train["padding_mask"]
        )
        out = {}
        for cohort in ("training", "validation"):
            d = dict(data[cohort])
            new = align_labels(raw_labels[cohort], align_map)
            d["cluster_id"] = new
            d.pop("ob", None)
            d.pop("padding_mask", None)
            if is_main_process():  # multi-host: single writer
                np.save(os.path.join(out_path, f"{cohort}_{opt_k}.npy"), d)
            out[cohort] = new
        return out

    # ---------------------------------------------------------------- dl
    def _pred_dl(self, data, out_path: str) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        key = "cluster_label" if cfg.dl_cluster_label_type == "label" else "cluster_pred"
        out = {}
        for cohort in COHORTS:
            d = dict(data[cohort])
            prob = d[key]
            opt_k = prob.shape[1]
            d["cluster_id"] = np.argmax(prob, axis=1)
            for k in DL_KEYS:
                d.pop(k, None)
            d.pop("ob", None)
            d.pop("padding_mask", None)
            if is_main_process():  # multi-host: single writer
                np.save(os.path.join(out_path, f"{cohort}_{opt_k}.npy"), d)
            out[cohort] = d["cluster_id"]
        return out
