"""DEC joint fine-tuning runtime (p3).

Extends the pretrain trainer (reference clustering_trainer.TrainerCluster,
clustering_trainer.py:21-545):
  * Phase 1 — cluster-center initialization: partial restore of the p1
    checkpoint (filtered strict=False load, :431-447), latents extracted on
    the training cohort, k-means (n_init=20) fit — here the k-means runs
    on-device instead of the GPU→CPU→sklearn round-trip (:74-82) — and the
    centers written into the `cluster_centers` param leaf. 'random' init
    draws uniformly within the per-dimension latent range (:84-93).
  * Phase 2 — joint epochs with the added KL loss; after each epoch the
    validation cluster assignments are re-predicted and `delta` = fraction
    of changed argmax labels becomes both a monitored checkpoint metric and
    the stopping criterion (`delta < stopping_delta`, :118-124, 473-484).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cluster.kmeans import kmeans_predict
from ..config import Config
from ..data.loader import ArrayDataset
from ..utils import logger, timer
from . import checkpoint as ckpt
from .trainer import Trainer, _fmt


def _cat_dump(chunks):
    """Join eval dump chunks in batch (= dataset) order: the fused path
    yields one device or np array, the per-batch path a host list."""
    if len(chunks) == 1:
        return chunks[0]
    return np.concatenate([np.asarray(c) for c in chunks], axis=0)


class ClusterTrainer(Trainer):
    clustering = True

    def __init__(
        self,
        cfg: Config,
        datasets: Dict[str, ArrayDataset],
        exp_path: str,
        pretrain_exp_path: Optional[str] = None,
        mesh=None,
        use_tensorboard: bool = True,
    ):
        super().__init__(cfg, datasets, exp_path, mesh, use_tensorboard)
        self.pretrain_exp_path = pretrain_exp_path

    @property
    def restore_metric(self) -> str:
        # DEC checkpoints restore on their own metric (reference p3:29)
        return self.cfg.dc_restore_metric

    # ------------------------------------------------- phase 1: init
    def load_pretrain_weight(self) -> None:
        """Filtered partial load of the p1 checkpoint: only keys present in
        this model are taken; the DEC head keeps its init
        (reference clustering_trainer.py:431-447)."""
        path = os.path.join(
            self.pretrain_exp_path, "weight", self.cfg.restore_metric, ckpt.CKPT_NAME
        )
        _, p_params, p_state, _, _ = ckpt.load_checkpoint(path)
        merged_p, loaded = ckpt.partial_restore(jax.device_get(self.params), p_params)
        merged_s, _ = ckpt.partial_restore(jax.device_get(self.state), p_state)
        self.params = jax.tree_util.tree_map(jnp.asarray, merged_p)
        self.state = jax.tree_util.tree_map(jnp.asarray, merged_s)
        self._replicate_over_mesh()
        logger.info("=> loaded %d pretrain leaves from %s", len(loaded), path)

    def _replicate_over_mesh(self) -> None:
        if self.mesh is not None:
            from ..parallel import replicate_tree

            self.params = replicate_tree(self.mesh, self.params)
            self.state = replicate_tree(self.mesh, self.state)

    def generate_pretrain_feat(self, cohort: str, denoise: bool = False):
        """Latent extraction for the center init (reference
        clustering_trainer.py:74-82's feature pass). Returns the (n, d)
        `hidden` array in dataset order — device-resident when the fused
        single-process eval runs, so the only consumer (on-device k-means)
        never pays the D2H tunnel; np on the multi-host / per-batch paths."""
        from ..info import COHORT2SCOPE

        # center init only consumes the latents — skip the D2H of rec_ob etc.
        metrics, dumps = self.eval_one_epoch(
            COHORT2SCOPE[cohort], self.datasets[cohort], denoise,
            dump_keys=("hidden",), device_dumps=True,
        )
        logger.info("%s %s", cohort, _fmt(metrics))
        return _cat_dump(dumps["hidden"])

    def init_centers(self) -> Optional[np.ndarray]:
        """Returns the previous validation cluster prediction (or None)."""
        cfg = self.cfg
        mode = cfg.init_cluster_center
        if mode == "none":
            return None
        self.load_pretrain_weight()
        hidden = self.generate_pretrain_feat("training")
        if mode == "kmeans":
            from ..cluster.kmeans import fit_kmeans_impl

            if cfg.kmeans_impl == "sklearn":  # host mirror needs host arrays
                hidden = np.asarray(hidden)
            result = fit_kmeans_impl(
                cfg, cfg.seed, hidden, cfg.cluster_number, n_init=cfg.kmeans_n_init
            )
            centers = result.centers
            valid_prev = kmeans_predict(
                jnp.asarray(centers), self.generate_pretrain_feat("validation")
            )
        elif mode == "random":
            hidden = np.asarray(hidden)
            lo, hi = hidden.min(axis=0), hidden.max(axis=0)
            rng = np.random.RandomState(cfg.seed)
            centers = rng.uniform(lo, hi, size=(cfg.cluster_number, hidden.shape[-1]))
            valid_prev = None
        else:
            raise ValueError(f"unknown init_cluster_center {mode!r}")
        self.params = dict(self.params)
        self.params["cluster_centers"] = jnp.asarray(centers, jnp.float32)
        self._replicate_over_mesh()
        logger.info("***** cluster initialize %s done *****", mode)
        return valid_prev

    # ------------------------------------------------- phase 2: epochs
    def generate_pred_cluster(
        self, scope: str, ds: ArrayDataset, prev_pred: Optional[np.ndarray], denoise=False
    ) -> Tuple[float, np.ndarray, Dict[str, float]]:
        """Per-epoch cluster re-prediction + label-change delta (reference
        clustering_trainer.py:118-124). The soft assignments stay on device
        when the fused eval allows it: argmax + the changed-label count run
        there and only the delta scalar syncs to host, so the per-epoch
        delta eval costs one scalar D2H instead of an (n, K) dump fetch
        (first-max tie-breaking is identical in np and jnp argmax)."""
        metrics, dumps = self.eval_one_epoch(
            scope, ds, denoise, dump_keys=("cluster_pred",), device_dumps=True
        )
        pred = _cat_dump(dumps["cluster_pred"])
        xp = jnp if isinstance(pred, jax.Array) else np
        cluster_pred = xp.argmax(pred, axis=1)
        if prev_pred is None:
            delta = 1.0
        else:
            delta = float(
                xp.sum(cluster_pred != xp.asarray(prev_pred))
            ) / int(prev_pred.shape[0])
        return delta, cluster_pred, metrics

    def train(self) -> Dict[str, float]:
        cfg = self.cfg
        valid_prev = self.init_centers()
        last_valid: Dict[str, float] = {}
        with timer("Duration of training"):
            while self.epoch < cfg.max_epochs:
                train_metrics = self.train_one_epoch(
                    self.datasets["training"], denoise=cfg.denoise
                )
                logger.info("==> Epoch %d train %s", self.epoch, _fmt(train_metrics))

                delta, valid_pred, valid_metrics = self.generate_pred_cluster(
                    "valid", self.datasets["validation"], valid_prev
                )
                logger.info("Epoch %d: valid delta of label change: %s", self.epoch, delta)
                valid_metrics["delta"] = delta
                last_valid = valid_metrics
                self.aly_pred("valid", valid_metrics)

                if self.epoch % cfg.update_interval == 0:
                    if cfg.stopping_delta is not None and delta < cfg.stopping_delta:
                        logger.info(
                            'Early stopping as label delta "%1.5f" < "%1.5f".',
                            delta, cfg.stopping_delta,
                        )
                        break
                    valid_prev = valid_pred
                self.epoch += 1
        return last_valid
