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
from .optim import set_learning_rate
from .trainer import Trainer, _fmt


@jax.jit
def _count_changed(chunks, prev):
    """Fuse the post-eval delta pipeline — concat + argmax + compare +
    sum — into ONE dispatch. Outside jit each op is its own XLA dispatch
    riding the tunnel (~40-60 ms RTT each); the deferred DEC loop pays
    this every epoch (PARITY.md r5 dispatch-count ledger)."""
    pred = jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]
    labels = jnp.argmax(pred, axis=1)
    return jnp.sum(labels != prev), labels


@jax.jit
def _argmax_chunks(chunks):
    pred = jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]
    return jnp.argmax(pred, axis=1)


@jax.jit
def _copy_arrays(xs):
    # one compiled computation for the whole leaf list: without donation
    # the jit outputs are guaranteed fresh buffers, and ONE dispatch ride
    # on the tunnel instead of one per leaf (per-leaf .copy() measured
    # 0.69 -> 2.24 s/epoch at 100k — dispatch latency, not HBM)
    return [jnp.copy(x) for x in xs]


def _snapshot(tree):
    """Device-side copy of a carry tree's array leaves. The fused train
    step DONATES its (params, state, opt_state) inputs (steps.py), so a
    retained rollback handle must not alias the dispatch inputs — the
    donation would delete its buffers. ~8 MB async HBM copy at the
    production model size: noise next to a train epoch."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idx = [i for i, leaf in enumerate(leaves) if isinstance(leaf, jax.Array)]
    copied = _copy_arrays([leaves[i] for i in idx])
    for i, c in zip(idx, copied):
        leaves[i] = c
    return jax.tree_util.tree_unflatten(treedef, leaves)


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
    def _dispatch_pred_cluster(
        self, scope: str, ds: ArrayDataset, prev_pred: Optional[np.ndarray],
        denoise=False, defer_losses: bool = False,
    ):
        """Dispatch the per-epoch cluster re-prediction (reference
        clustering_trainer.py:118-124) WITHOUT syncing the result. The
        soft assignments stay on device when the fused eval allows it:
        argmax + the changed-label count run there, so the eventual sync
        is one scalar D2H instead of an (n, K) dump fetch (first-max
        tie-breaking is identical in np and jnp argmax). Returns
        `(count, cluster_pred, metrics)` where `count` is the un-fetched
        changed-label count (None on the first epoch) — resolve it with
        `_resolve_delta`. `defer_losses=True` (deferred cadence)
        additionally leaves the eval losses on device — `metrics` is then
        the device per-batch loss dict (see Trainer.eval_one_epoch)."""
        metrics, dumps = self.eval_one_epoch(
            scope, ds, denoise, dump_keys=("cluster_pred",),
            device_dumps=True, defer_losses=defer_losses,
        )
        chunks = dumps["cluster_pred"]
        if all(isinstance(c, jax.Array) for c in chunks):
            # device path: ONE fused dispatch instead of concat/argmax/
            # compare/sum each paying a tunnel round trip
            if prev_pred is not None:
                count, cluster_pred = _count_changed(
                    tuple(chunks), jnp.asarray(prev_pred)
                )
            else:
                count, cluster_pred = None, _argmax_chunks(tuple(chunks))
        else:  # host path (multi-process / per-batch eval)
            cluster_pred = np.argmax(_cat_dump(chunks), axis=1)
            count = None
            if prev_pred is not None:
                count = np.sum(cluster_pred != np.asarray(prev_pred))
        return count, cluster_pred, metrics

    @staticmethod
    def _resolve_delta(count, n_rows: Optional[int]):
        """Sync a dispatched changed-label count into `(delta, n_changed)`
        — the one mandatory D2H of the DEC epoch loop."""
        if count is None:
            return 1.0, None
        n_changed = int(count)
        return n_changed / n_rows, n_changed

    def generate_pred_cluster(
        self, scope: str, ds: ArrayDataset, prev_pred: Optional[np.ndarray],
        denoise=False, defer_losses: bool = False,
    ) -> Tuple[float, Optional[int], np.ndarray, Dict[str, float]]:
        """Dispatch + immediately resolve the label-change delta. Returns
        `(delta, n_changed, cluster_pred, metrics)`."""
        count, cluster_pred, metrics = self._dispatch_pred_cluster(
            scope, ds, prev_pred, denoise, defer_losses
        )
        delta, n_changed = self._resolve_delta(
            count, None if prev_pred is None else int(prev_pred.shape[0])
        )
        return delta, n_changed, cluster_pred, metrics

    def _should_stop(self, delta: float, n_changed: Optional[int]) -> Optional[str]:
        """Evaluate cfg.stopping_mode; returns the stop reason or None.

        "delta" is the reference's fraction criterion
        (clustering_trainer.py:118-124); "count"/"patience" are the
        usable-at-scale opt-ins (see Config.stopping_mode — at 100k the
        reference criterion provably never fires, PARITY.md r4)."""
        cfg = self.cfg
        if cfg.stopping_mode == "delta":
            if cfg.stopping_delta is not None and delta < cfg.stopping_delta:
                return (
                    f'label delta "{delta:1.5f}" < "{cfg.stopping_delta:1.5f}"'
                )
        elif cfg.stopping_mode == "count":
            if n_changed is not None and n_changed <= cfg.stopping_count:
                return (
                    f"changed-label count {n_changed} <= {cfg.stopping_count}"
                )
        else:  # patience on the running delta minimum
            if delta < self._best_delta:
                self._best_delta = delta
                self._since_improve = 0
            else:
                self._since_improve += 1
                if self._since_improve >= cfg.stopping_patience:
                    return (
                        f'delta minimum "{self._best_delta:1.5f}" unimproved '
                        f"for {self._since_improve} checks"
                    )
        return None

    def train(self) -> Dict[str, float]:
        """The DEC epoch loop. `eval_interval=1` (default) is the
        reference's cadence: train, delta eval, aly_pred (checkpoints +
        valid metrics) every epoch. `eval_interval>1` (opt-in, single-
        process fused path) keeps the PER-EPOCH on-device delta eval —
        stopping rides it — but defers every other host round trip to the
        boundary: intermediate epochs dispatch the fused train epoch
        async, fetch ONE changed-label scalar, and queue the train/valid
        loss handles; checkpointing and plateau-LR stepping happen at
        boundaries only (the pretrain trainer's documented eval_interval
        semantics). With `pipeline_delta` (opt-in; measured neutral on
        the tunnel backend — Config.pipeline_delta) even that scalar
        fetch is lagged one epoch: epoch e's count syncs AFTER epoch
        e+1's dispatch; when the lagged criterion fires, the loop
        restores snapshot copies of the pre-dispatch carries, making the
        stopping epoch, the delta trajectory AND the final weights
        bit-identical to the unpipelined cadence at the cost of one
        discarded speculative epoch per run (tests/test_dec_stopping.py)."""
        cfg = self.cfg
        train_ds = self.datasets["training"]
        valid_ds = self.datasets["validation"]
        valid_prev = self.init_centers()
        last_valid: Dict[str, float] = {}
        self._best_delta = float("inf")
        self._since_improve = 0
        self.delta_history: list = []
        # deferred epochs: (epoch, train handles, n_batches, valid loss
        # handles, delta) — drained at each eval boundary
        pending: list = []
        # pipeline_delta: the one epoch whose changed-label count is
        # dispatched but not yet fetched
        inflight: Optional[dict] = None

        def drain():
            nonlocal last_valid
            for e, handles, nb, vh, delta in pending:
                logger.info(
                    "==> Epoch %d train %s",
                    e, _fmt(self._finalize_fused_epoch(e, handles, nb)),
                )
                if vh is not None:
                    vm = {
                        k: float(np.mean(v))
                        for k, v in jax.device_get(vh).items()
                    }
                    vm["delta"] = delta
                    self.summary.add_summary(e, scope="valid", **vm)
                    logger.info("Epoch %d valid %s", e, _fmt(vm))
                    last_valid = vm
            pending.clear()

        def resolve_inflight():
            """Fetch the lagged epoch's count; log, record and stop-check
            it exactly as the unpipelined loop would have at that epoch.
            Returns `(stop_msg, lagged_epoch)`."""
            nonlocal inflight
            rec = inflight
            inflight = None
            delta, n_changed = self._resolve_delta(rec["count"], rec["n_rows"])
            pending.append(
                (rec["epoch"], rec["handles"], rec["nb"], rec["vh"], delta)
            )
            logger.info(
                "Epoch %d: valid delta of label change: %s",
                rec["epoch"], delta,
            )
            self.delta_history.append(delta)
            stop_msg = None
            if rec["epoch"] % cfg.update_interval == 0:
                stop_msg = self._should_stop(delta, n_changed)
            return stop_msg, rec["epoch"]

        def stop_candidacy(host_metrics=None, delta=None):
            """An early stop ends the run mid-interval: the deferred
            cadence checkpoints at eval boundaries only, so without this
            the STOPPING epoch's weights — the final in-memory state that
            p3's post-train dumps restore via load_weight — would never
            be checkpoint-eligible (up to eval_interval-1 epochs stale
            vs what train() returns). drain() already wrote the summary
            row and the epoch already stepped its LR, so candidacy alone
            (Trainer._ckpt_candidacy). On the non-fused deferred path the
            valid metrics are host floats that were never summarized —
            write the row here too."""
            nonlocal last_valid
            if host_metrics is not None:
                # host floats on the per-batch path; per-batch device
                # arrays if only the eval side could fuse — mean either
                vm = {
                    k: float(np.mean(jax.device_get(v)))
                    for k, v in host_metrics.items()
                }
                vm["delta"] = delta
                self.summary.add_summary(self.epoch, scope="valid", **vm)
                last_valid = vm
            if last_valid:
                self._ckpt_candidacy(last_valid)

        with timer("Duration of training"):
            while self.epoch < cfg.max_epochs:
                is_eval = (
                    cfg.eval_interval <= 1
                    or self.epoch % cfg.eval_interval == 0
                    or self.epoch + 1 >= cfg.max_epochs
                )
                defer = (
                    cfg.eval_interval > 1
                    and self._can_fuse(train_ds)
                    and jax.process_count() == 1
                )
                # at a boundary nothing is about to hide the lagged fetch
                # (the drain syncs anyway) — resolve it BEFORE dispatching,
                # so a stop that fires cancels this epoch entirely
                if inflight is not None and is_eval:
                    stop_msg, stopped_epoch = resolve_inflight()
                    if stop_msg:
                        self.epoch = stopped_epoch
                        drain()
                        stop_candidacy()
                        logger.info("Early stopping as %s.", stop_msg)
                        break
                if defer:
                    n_batches = train_ds.num_batches(cfg.batch_size)
                    rollback = None
                    if cfg.pipeline_delta and not is_eval:
                        rollback = _snapshot(
                            (self.params, self.state, self.opt_state)
                        )
                    handles = self._dispatch_fused_epoch(
                        train_ds, cfg.denoise, self._epoch_key(self.epoch),
                        np.random.RandomState(cfg.seed + self.epoch),
                    )
                else:
                    train_metrics = self.train_one_epoch(
                        train_ds, denoise=cfg.denoise
                    )
                    logger.info(
                        "==> Epoch %d train %s", self.epoch, _fmt(train_metrics)
                    )

                if is_eval:
                    if defer:
                        pending.append(
                            (self.epoch, handles, n_batches, None, None)
                        )
                    drain()
                    delta, n_changed, valid_pred, valid_metrics = (
                        self.generate_pred_cluster("valid", valid_ds, valid_prev)
                    )
                    logger.info(
                        "Epoch %d: valid delta of label change: %s",
                        self.epoch, delta,
                    )
                    valid_metrics["delta"] = delta
                    last_valid = valid_metrics
                    self.aly_pred("valid", valid_metrics)
                elif defer and cfg.pipeline_delta:
                    # dispatch this epoch's delta eval, then resolve LAST
                    # epoch's scalar while the device crunches this one
                    count, valid_pred, vh = self._dispatch_pred_cluster(
                        "valid", valid_ds, valid_prev, defer_losses=True
                    )
                    rec = {
                        "epoch": self.epoch, "count": count,
                        "n_rows": None if valid_prev is None
                        else int(valid_prev.shape[0]),
                        "handles": handles, "nb": n_batches, "vh": vh,
                    }
                    if inflight is not None:
                        stop_msg, stopped_epoch = resolve_inflight()
                        if stop_msg:
                            # cancel this epoch's speculative work: the
                            # param trees are immutable, so the retained
                            # pre-dispatch handles ARE the post-stopped-
                            # epoch weights
                            self.params, self.state, self.opt_state = rollback
                            self.epoch = stopped_epoch
                            drain()
                            stop_candidacy()
                            logger.info("Early stopping as %s.", stop_msg)
                            break
                    inflight = rec
                    if self.epoch % cfg.update_interval == 0:
                        valid_prev = valid_pred
                    if cfg.lr_decay_mode != "plateau":
                        self.lr_schedule.step(None)
                        set_learning_rate(self.opt_state, self.lr_schedule.lr)
                    self.epoch += 1
                    continue
                else:
                    delta, n_changed, valid_pred, vh = self.generate_pred_cluster(
                        "valid", valid_ds, valid_prev, defer_losses=True
                    )
                    if defer:
                        pending.append(
                            (self.epoch, handles, n_batches, vh, delta)
                        )
                    logger.info(
                        "Epoch %d: valid delta of label change: %s",
                        self.epoch, delta,
                    )
                    # epoch-indexed LR schedules advance every epoch even
                    # without an eval; plateau steps at evals only (it
                    # needs the valid loss) — Config.eval_interval
                    if cfg.lr_decay_mode != "plateau":
                        self.lr_schedule.step(None)
                        set_learning_rate(self.opt_state, self.lr_schedule.lr)
                self.delta_history.append(delta)

                if self.epoch % cfg.update_interval == 0:
                    stop_msg = self._should_stop(delta, n_changed)
                    if stop_msg:
                        drain()
                        if not is_eval:  # boundary stops ran aly_pred already
                            stop_candidacy(None if defer else vh, delta)
                        logger.info("Early stopping as %s.", stop_msg)
                        break
                    valid_prev = valid_pred
                self.epoch += 1
            if inflight is not None:  # defensive: the last epoch is a boundary
                resolve_inflight()
            drain()  # defensive: every eval boundary already drained
        return last_valid
