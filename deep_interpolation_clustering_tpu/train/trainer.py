"""The pretrain training runtime (p1).

Epoch driver with the reference's exact control surface
(pretrain_trainer.py:17-438): train epoch → valid eval → `aly_pred`
(epoch-level LR schedule + min-LR clamp, per-metric best checkpoints,
patience early-stop) — but the per-batch work is one compiled XLA program
over a data mesh instead of a Python loop over torch modules, and the
feature dump / re-normalization path (:416-429) writes the same
`{cohort}.npy` dict downstream p2-p4 consume.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.loader import ArrayDataset
from ..info import COHORT2SCOPE, METRICS, MIN_MAX_VALUES
from ..models import init_net
from ..parallel import (
    device_fetch,
    is_main_process,
    make_mesh,
    pad_batch_to,
    replicate_tree,
    shard_batch,
)
from ..utils import logger, timer, tree_size
from . import checkpoint as ckpt
from .optim import LRSchedule, get_learning_rate, make_optimizer, set_learning_rate
from .steps import (
    make_eval_epoch,
    make_eval_epoch_blocks,
    make_eval_step,
    make_eval_step_blocks,
    make_train_epoch,
    make_train_epoch_blocks,
    make_train_step,
    make_train_step_blocks,
)
from .summary import Summary


class Trainer:
    """Interpolation-autoencoder pretraining (reference pretrain_trainer.Trainer)."""

    clustering = False

    def __init__(
        self,
        cfg: Config,
        datasets: Dict[str, ArrayDataset],
        exp_path: str,
        mesh=None,
        use_tensorboard: bool = True,
    ):
        self.cfg = cfg
        self.datasets = datasets
        self.exp_path = exp_path
        # data_parallel: 0 = single device, -1 = all local devices, N = N
        self.mesh = mesh if mesh is not None else (
            make_mesh(max(cfg.data_parallel, 0)) if cfg.data_parallel else None
        )
        self.n_shards = self.mesh.devices.size if self.mesh is not None else 1
        if cfg.batch_size % self.n_shards:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by mesh size {self.n_shards}"
            )

        # the root key's impl propagates to EVERY draw in the run (splits /
        # fold_ins inherit it): augmentation, fake select bits, dropout,
        # param init. "rbg" rides the hardware RNG — see Config.prng_impl.
        key = jax.random.key(cfg.seed, impl=cfg.prng_impl)
        self.base_key, init_key = jax.random.split(key)
        self.params, self.state = init_net(
            init_key, cfg, clustering=self.clustering
        )
        self.optimizer = make_optimizer(cfg)
        self.opt_state = self.optimizer.init(self.params)
        if self.mesh is not None:
            self.params = replicate_tree(self.mesh, self.params)
            self.state = replicate_tree(self.mesh, self.state)
            self.opt_state = replicate_tree(self.mesh, self.opt_state)

        self.lr_schedule = LRSchedule(cfg)
        self.epoch = 1
        self.flag_dict = ckpt.FlagDict(METRICS)
        self.weight_paths = ckpt.weight_dirs(os.path.join(exp_path, "weight"), METRICS)
        self.summary = Summary(
            os.path.join(exp_path, "summary"), use_tensorboard=use_tensorboard
        )
        cfg.save(exp_path)

        # jitted steps / fused epochs, cached per denoise flag
        self._train_steps: Dict[bool, callable] = {}
        self._eval_steps: Dict[bool, callable] = {}
        self._train_epochs: Dict[bool, callable] = {}
        self._eval_epochs: Dict[bool, callable] = {}
        # HBM-resident cohort arrays, uploaded once per cohort:
        # replicated flat planes off-mesh, row-sharded block layout on a
        # mesh (cfg.shard_cohort — per-device HBM = cohort/n_shards)
        self._device_data: Dict[str, Dict] = {}
        self._block_data: Dict[str, "object"] = {}

        n_params = tree_size(self.params)
        n_train = len(datasets["training"]) if "training" in datasets else 0
        logger.info(
            "trainable params: %d; train samples: %d; ratio %.3f",
            n_params, n_train, n_params / max(n_train, 1),
        )

    # ------------------------------------------------------------- steps
    @property
    def _shard_cohort(self) -> bool:
        """Device-resident cohorts are row-sharded (block layout) on a mesh
        with cfg.shard_cohort; replicated flat planes otherwise."""
        return (
            self.cfg.device_data
            and self.cfg.shard_cohort
            and self.mesh is not None
        )

    def _train_step(self, denoise: bool, masked: bool = False):
        k = (denoise, masked, self._shard_cohort)
        if k not in self._train_steps:
            if self._shard_cohort:
                self._train_steps[k] = make_train_step_blocks(
                    self.cfg, self.optimizer, denoise, masked=masked
                )
            else:
                self._train_steps[k] = make_train_step(
                    self.cfg, self.optimizer, denoise,
                    gather=self.cfg.device_data, masked=masked,
                )
        return self._train_steps[k]

    def _eval_step(self, denoise: bool, dump_keys=None):
        k = (denoise, dump_keys, self._shard_cohort)
        if k not in self._eval_steps:
            if self._shard_cohort:
                self._eval_steps[k] = make_eval_step_blocks(
                    self.cfg, denoise, dump_keys=dump_keys
                )
            else:
                self._eval_steps[k] = make_eval_step(
                    self.cfg, denoise, gather=self.cfg.device_data,
                    dump_keys=dump_keys,
                )
        return self._eval_steps[k]

    def _train_epoch_fn(self, denoise: bool):
        if denoise not in self._train_epochs:
            maker = (
                make_train_epoch_blocks if self._shard_cohort
                else make_train_epoch
            )
            self._train_epochs[denoise] = maker(self.cfg, self.optimizer, denoise)
        return self._train_epochs[denoise]

    def _eval_epoch_fn(self, denoise: bool, dump_keys=None):
        k = (denoise, dump_keys)
        if k not in self._eval_epochs:
            maker = (
                make_eval_epoch_blocks if self._shard_cohort
                else make_eval_epoch
            )
            self._eval_epochs[k] = maker(self.cfg, denoise, dump_keys)
        return self._eval_epochs[k]

    def _cohort_device_data(self, ds: ArrayDataset) -> Dict:
        """Upload a cohort to HBM once (replicated across the mesh); later
        epochs gather batches on device from these arrays."""
        if ds.cohort not in self._device_data:
            arrays = {k: jnp.asarray(v) for k, v in ds.arrays().items()}
            if self.mesh is not None:
                arrays = replicate_tree(self.mesh, arrays)
            self._device_data[ds.cohort] = arrays
        return self._device_data[ds.cohort]

    def _cohort_block_data(self, ds: ArrayDataset):
        """Upload a cohort to HBM once, row-SHARDED over the mesh in block
        layout (parallel/cohort.ShardedCohort): per-device HBM =
        cohort/n_shards instead of a full replica per device."""
        if ds.cohort not in self._block_data:
            from ..parallel.cohort import ShardedCohort

            cohort = ShardedCohort(self.mesh, ds.arrays(), self.cfg.batch_size)
            logger.info(
                "cohort '%s' row-sharded over %d devices: %.1f MB/device "
                "(replicated would be %.1f MB/device)",
                ds.cohort, self.n_shards,
                cohort.nbytes_per_device() / 2**20,
                cohort.nbytes_per_device() * self.n_shards / 2**20,
            )
            self._block_data[ds.cohort] = cohort
        return self._block_data[ds.cohort]

    def _put_idx(self, idx: np.ndarray):
        if self.mesh is None:
            return jnp.asarray(idx)
        from ..parallel import batch_sharding

        return jax.device_put(jnp.asarray(idx), batch_sharding(self.mesh))

    def _put_idx_mat(self, mat: np.ndarray):
        """(n_batches, B) index/mask matrix: the scan axis stays whole, the
        batch axis is sharded over the mesh."""
        if self.mesh is None:
            return jnp.asarray(mat)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            jnp.asarray(mat), NamedSharding(self.mesh, P(None, "data"))
        )

    def _epoch_key(self, epoch: int, salt: int = 0):
        return jax.random.fold_in(jax.random.fold_in(self.base_key, epoch), salt)

    def _can_fuse(self, ds: ArrayDataset) -> bool:
        """Single source of truth for the fused-epoch precondition — used
        by both the per-epoch path and train()'s eval_interval defer gate,
        which must never diverge (the bit-identity contract between the
        two cadences rides on them dispatching the same program)."""
        cfg = self.cfg
        return cfg.device_data and cfg.fused_epoch and len(ds) >= cfg.batch_size

    # ------------------------------------------------------------- train
    def train(self) -> Dict[str, float]:
        if self.cfg.restore:
            self.load_weight()
        cfg = self.cfg
        train_ds = self.datasets["training"]
        last_valid: Dict[str, float] = {}
        # eval_interval>1: fused epochs dispatched but not yet fetched.
        # Intermediate epochs have NO host-side device dependency (shuffle
        # order is host RNG, "step"/"warmup" LR is closed-form, checkpoints
        # and early-stop live at eval boundaries), so the dispatches queue
        # back-to-back and the k loss fetches collapse into one tunnel
        # round trip at the boundary — the dominant per-epoch overhead at
        # scale (see Config.eval_interval).
        pending: list = []

        def drain():
            for e, handles, nb in pending:
                logger.info(
                    "==> Epoch %d train %s",
                    e, _fmt(self._finalize_fused_epoch(e, handles, nb)),
                )
            pending.clear()

        with timer("Duration of training"):
            while self.epoch < cfg.max_epochs:
                is_eval = (
                    cfg.eval_interval <= 1
                    or self.epoch % cfg.eval_interval == 0
                    or self.epoch + 1 >= cfg.max_epochs
                )
                defer = cfg.eval_interval > 1 and self._can_fuse(train_ds)
                if defer:
                    n_batches = train_ds.num_batches(cfg.batch_size)
                    handles = self._dispatch_fused_epoch(
                        train_ds, cfg.denoise, self._epoch_key(self.epoch),
                        np.random.RandomState(cfg.seed + self.epoch),
                    )
                    pending.append((self.epoch, handles, n_batches))
                else:
                    train_metrics = self.train_one_epoch(
                        train_ds, denoise=cfg.denoise
                    )
                    logger.info(
                        "==> Epoch %d train %s", self.epoch, _fmt(train_metrics)
                    )
                if is_eval:
                    drain()
                    valid_metrics, _ = self.eval_one_epoch(
                        "valid", self.datasets["validation"], denoise=cfg.denoise
                    )
                    last_valid = valid_metrics
                    result = self.aly_pred("valid", valid_metrics)
                else:
                    # epoch-indexed schedules advance every epoch even
                    # without an eval; plateau can only step at evals (it
                    # needs the valid loss) — see Config.eval_interval
                    if cfg.lr_decay_mode != "plateau":
                        self.lr_schedule.step(None)
                        set_learning_rate(self.opt_state, self.lr_schedule.lr)
                    result = {"early_stop": False}
                self.epoch += 1
                if result["early_stop"]:
                    logger.info("======== best model: %s", self.flag_dict.to_dict())
                    break
            drain()  # defensive: every eval boundary already drained
        return last_valid

    def train_one_epoch(self, ds: ArrayDataset, denoise: bool) -> Dict[str, float]:
        cfg = self.cfg
        epoch_key = self._epoch_key(self.epoch)
        shuffle_rng = np.random.RandomState(cfg.seed + self.epoch)
        n_batches = ds.num_batches(cfg.batch_size)

        if self._can_fuse(ds):
            return self._train_one_epoch_fused(
                ds, denoise, epoch_key, shuffle_rng, n_batches
            )

        step_fn = self._train_step(denoise)
        metrics_acc: Dict[str, list] = defaultdict(list)

        # Per-batch losses stay on device until the epoch ends — fetching
        # them eagerly would force a host sync every step and serialize the
        # H2D batch transfer with the compute (the torch reference has the
        # same pipeline hazard via its .item() calls, :223).
        # The ragged tail batch trains on EVERY mesh size via a masked step
        # (_tail_train_step): padded to the full batch shape (repeated real
        # rows), sample-masked out of losses and BN moments — the
        # reference's short-batch semantics (no drop_last anywhere,
        # pretrain_trainer.py:127-130), mesh-divisible.
        pending: list = []
        use_blocks = self._shard_cohort
        if cfg.device_data:
            n = len(ds)
            order = np.arange(n)
            shuffle_rng.shuffle(order)
            batches = [
                order[s : s + cfg.batch_size].astype(np.int32)
                for s in range(0, n, cfg.batch_size)
            ]
            if use_blocks:
                cohort = self._cohort_block_data(ds)
                cohort.ensure(cohort.epoch_order(order))
            else:
                data = self._cohort_device_data(ds)
        else:
            batches = ds.iter_batches(
                cfg.batch_size, shuffle=True, rng=shuffle_rng
            )
        for i, batch in enumerate(batches, start=1):
            key = jax.random.fold_in(epoch_key, i)
            if cfg.device_data:
                if use_blocks:
                    if len(batch) < cfg.batch_size:
                        losses = self._tail_train_step_blocks(
                            denoise, cohort, i - 1, len(batch), key
                        )
                    else:
                        self.params, self.state, self.opt_state, losses = step_fn(
                            self.params, self.state, self.opt_state,
                            cohort.data3, jnp.asarray(i - 1, jnp.int32), key,
                        )
                elif len(batch) < cfg.batch_size:
                    losses = self._tail_train_step(denoise, data, batch, key)
                else:
                    self.params, self.state, self.opt_state, losses = step_fn(
                        self.params, self.state, self.opt_state, data,
                        self._put_idx(batch), key,
                    )
            else:
                batch.pop("index", None)
                n_real = next(
                    v.shape[0] for v in batch.values()
                    if isinstance(v, np.ndarray)
                )
                if n_real < cfg.batch_size:
                    batch, _ = pad_batch_to(batch, cfg.batch_size)
                batch = shard_batch(self.mesh, batch)
                self.params, self.state, self.opt_state, losses = step_fn(
                    self.params, self.state, self.opt_state, batch, key
                )
            pending.append(losses)
            if i % cfg.log_train_freq == 1:
                fetched = jax.device_get(losses)
                logger.info(
                    "%d-[%d/%d (%.0f%%)]: train-%s",
                    self.epoch, i, n_batches, 100.0 * i / n_batches, _fmt(fetched),
                )
                self.summary.add_summary(
                    self.epoch * n_batches + i, scope="train_batch", **fetched
                )
        for losses in jax.device_get(pending):
            for k, v in losses.items():
                metrics_acc[k].append(float(v))
        out = {k: float(np.mean(v)) for k, v in metrics_acc.items()}
        self.summary.add_summary(self.epoch, scope="train", **out)
        return out

    def _tail_train_step(self, denoise: bool, data: Dict, tail_idx, key):
        """Train the ragged tail as one masked full-shape step: indices
        padded by cyclically repeating the real rows (finite values — zero
        rows would push NaN through the masked logsumexp gradients), the
        sample mask excluding the padding from every loss reduction and
        from the BatchNorm batch moments. Works on every mesh size — the
        batch stays shape-stable and divisible — so sharded epochs train
        every encounter like the reference (no drop_last,
        pretrain_trainer.py:127-130). Returns the device losses handle."""
        cfg = self.cfg
        b = cfg.batch_size
        idx_pad = np.resize(np.asarray(tail_idx, np.int32), b)
        mask = np.zeros((b,), np.float32)
        mask[: len(tail_idx)] = 1.0
        step_fn = self._train_step(denoise, masked=True)
        self.params, self.state, self.opt_state, losses = step_fn(
            self.params, self.state, self.opt_state, data,
            self._put_idx(idx_pad), self._put_idx(mask), key,
        )
        return losses

    def _tail_train_step_blocks(self, denoise: bool, cohort, k: int, n_tail: int, key):
        """Block-layout tail step: storage block `k` already holds the
        cyclically-wrapped tail rows (ShardedCohort.epoch_order bakes the
        same `np.resize` padding `_tail_train_step` applies); the mask
        carries the short-batch semantics exactly as the gather variant."""
        b = self.cfg.batch_size
        mask = np.zeros((b,), np.float32)
        mask[:n_tail] = 1.0
        step_fn = self._train_step(denoise, masked=True)
        self.params, self.state, self.opt_state, losses = step_fn(
            self.params, self.state, self.opt_state, cohort.data3,
            jnp.asarray(k, jnp.int32), self._put_idx(mask), key,
        )
        return losses

    def _train_one_epoch_fused(
        self, ds: ArrayDataset, denoise: bool, epoch_key, shuffle_rng, n_batches
    ) -> Dict[str, float]:
        """One dispatch per epoch: lax.scan over the shuffled index matrix.
        Batch-RNG keys match the per-batch path exactly (steps.batch_keys),
        so fused and unfused epochs are bit-identical; any ragged tail batch
        runs as one ordinary step with the next key in the sequence."""
        handles = self._dispatch_fused_epoch(ds, denoise, epoch_key, shuffle_rng)
        return self._finalize_fused_epoch(self.epoch, handles, n_batches)

    def _dispatch_fused_epoch(
        self, ds: ArrayDataset, denoise: bool, epoch_key, shuffle_rng
    ):
        """Dispatch one fused train epoch (scan + ragged tail step) with NO
        host sync; returns the device-side loss handles. Separating
        dispatch from fetch is what lets `eval_interval>1` queue several
        epochs back-to-back before paying one tunnel round trip."""
        cfg = self.cfg
        n = len(ds)
        order = np.arange(n)
        shuffle_rng.shuffle(order)
        b = cfg.batch_size
        n_full = n // b
        epoch_fn = self._train_epoch_fn(denoise)

        if self._shard_cohort:
            # row-sharded storage: relayout into this epoch's order (one
            # all_to_all, dispatched async like everything else here), then
            # the scan slices blocks — same batches, same keys, same math
            cohort = self._cohort_block_data(ds)
            cohort.ensure(cohort.epoch_order(order))
            self.params, self.state, self.opt_state, losses = epoch_fn(
                self.params, self.state, self.opt_state, cohort.data3,
                jnp.arange(n_full, dtype=jnp.int32), epoch_key,
            )
            tail_losses = None
            if n % b:
                key = jax.random.fold_in(epoch_key, n_full + 1)
                tail_losses = self._tail_train_step_blocks(
                    denoise, cohort, n_full, n % b, key
                )
            return losses, tail_losses

        data = self._cohort_device_data(ds)
        idx_mat = order[: n_full * b].reshape(n_full, b).astype(np.int32)
        self.params, self.state, self.opt_state, losses = epoch_fn(
            self.params, self.state, self.opt_state, data,
            self._put_idx_mat(idx_mat), epoch_key,
        )

        tail = order[n_full * b :].astype(np.int32)
        tail_losses = None
        if len(tail):
            key = jax.random.fold_in(epoch_key, n_full + 1)
            tail_losses = self._tail_train_step(denoise, data, tail, key)
        return losses, tail_losses

    def _finalize_fused_epoch(
        self, epoch: int, handles, n_batches: int
    ) -> Dict[str, float]:
        """Fetch a dispatched epoch's losses and write its log/summary
        records (post-hoc, at the same steps the per-batch path logs live)."""
        cfg = self.cfg
        losses, tail_losses = handles
        losses = jax.device_get(losses)
        if tail_losses is not None:
            tail_losses = jax.device_get(tail_losses)
            losses = {
                k: np.concatenate([v, [tail_losses[k]]]) for k, v in losses.items()
            }
        for i in range(1, len(next(iter(losses.values()))) + 1):
            if i % cfg.log_train_freq == 1:
                batch_metrics = {k: float(v[i - 1]) for k, v in losses.items()}
                logger.info(
                    "%d-[%d/%d (%.0f%%)]: train-%s",
                    epoch, i, n_batches, 100.0 * i / n_batches,
                    _fmt(batch_metrics),
                )
                self.summary.add_summary(
                    epoch * n_batches + i, scope="train_batch", **batch_metrics
                )
        out = {k: float(np.mean(v)) for k, v in losses.items()}
        self.summary.add_summary(epoch, scope="train", **out)
        return out

    # -------------------------------------------------------------- eval
    def eval_one_epoch(
        self, scope: str, ds: ArrayDataset, denoise: bool, dump_keys=None,
        device_dumps: bool = False, defer_losses: bool = False,
    ):
        """No-grad mirror of the train epoch; collects per-sample dumps
        (reference pretrain_trainer.py:243-366). Batches are shape-padded to
        a single compiled shape; sample masks keep the metrics exact.
        `dump_keys` restricts which outputs are fetched to the host — at
        100k scale the D2H of unneeded rec_ob dominates latent extraction.
        `device_dumps=True` goes further and skips the outputs D2H entirely,
        returning device-resident dump arrays for consumers whose next op is
        itself on-device (DEC center init / delta eval). Honored on the
        single-process fused path only — multi-host keeps the allgather
        fetch, the per-batch path keeps host stacking — so callers must
        accept either np or jax arrays. `defer_losses=True` (requires
        device_dumps, same single-process fused gate) additionally skips
        the loss fetch: the metrics slot returns the DEVICE per-batch loss
        dict for the caller to `jax.device_get` later — the DEC loop's
        deferred cadence fetches one delta scalar per epoch and drains
        these at its eval boundary."""
        cfg = self.cfg
        salt = int.from_bytes(scope.encode()[:4].ljust(4, b"\0"), "little")
        epoch_key = self._epoch_key(self.epoch, salt=salt)
        metrics_acc: Dict[str, list] = defaultdict(list)
        dumps: Dict[str, list] = defaultdict(list)
        n_batches = ds.num_batches(cfg.batch_size)

        if cfg.device_data and cfg.fused_epoch:
            return self._eval_one_epoch_fused(
                scope, ds, denoise, epoch_key, dump_keys, device_dumps,
                defer_losses,
            )

        step_fn = self._eval_step(denoise, dump_keys)
        pending: list = []

        use_blocks = self._shard_cohort
        data = cohort = None
        if cfg.device_data:
            if use_blocks:
                cohort = self._cohort_block_data(ds)
                cohort.ensure(cohort.identity_order())
            else:
                data = self._cohort_device_data(ds)
        n = len(ds)
        for i, start in enumerate(range(0, n, cfg.batch_size), start=1):
            idx = np.arange(start, min(start + cfg.batch_size, n))
            key = jax.random.fold_in(epoch_key, i)
            n_real = len(idx)
            if use_blocks:
                sample_mask = np.zeros((cfg.batch_size,), np.float32)
                sample_mask[:n_real] = 1.0
                losses, outputs = step_fn(
                    self.params, self.state, cohort.data3,
                    jnp.asarray(i - 1, jnp.int32),
                    self._put_idx(sample_mask),
                    key,
                )
            elif cfg.device_data:
                idx_pad = np.pad(idx, (0, cfg.batch_size - n_real)).astype(np.int32)
                sample_mask = np.zeros((cfg.batch_size,), np.float32)
                sample_mask[:n_real] = 1.0
                losses, outputs = step_fn(
                    self.params, self.state, data,
                    self._put_idx(idx_pad),
                    self._put_idx(sample_mask),
                    key,
                )
            else:
                batch = ds.batch(idx)
                batch.pop("index")
                batch, _ = pad_batch_to(batch, cfg.batch_size)
                batch = shard_batch(self.mesh, batch)
                losses, outputs = step_fn(self.params, self.state, batch, key)
            # keep device handles; one bulk fetch at epoch end so D2H
            # pipelines with compute instead of syncing every batch
            pending.append((losses, outputs, idx, n_real))
            if i % cfg.log_valid_freq == 1:
                logger.info(
                    "%d-[%d/%d (%.0f%%)]: %s-%s",
                    self.epoch, i, n_batches, 100.0 * i / n_batches, scope,
                    _fmt(jax.device_get(losses)),
                )
        for losses, outputs, idx, n_real in (
            (device_fetch((l, o)) + (ix, nr)) for l, o, ix, nr in pending
        ):
            for k, v in losses.items():
                metrics_acc[k].append(float(v))
            for k, v in outputs.items():
                dumps[k].append(np.asarray(v)[:n_real])
            dumps["__index__"].append(idx)
        metrics = {k: float(np.mean(v)) for k, v in metrics_acc.items()}
        return metrics, dumps

    def _eval_one_epoch_fused(self, scope, ds, denoise, epoch_key, dump_keys,
                              device_dumps: bool = False,
                              defer_losses: bool = False):
        """Fused eval: one scan over padded index rows; outputs stack on
        device, so the whole cohort's dumps arrive in one bulk fetch — or,
        with `device_dumps`, never leave the device at all (the fetch is the
        cost: over the axon tunnel D2H runs 1-15 MB/s, so a 70k-latent
        extraction spends minutes moving arrays whose only consumer is the
        on-device k-means)."""
        cfg = self.cfg
        n, b = len(ds), cfg.batch_size
        n_batches = -(-n // b)
        epoch_fn = self._eval_epoch_fn(denoise, dump_keys)
        if self._shard_cohort:
            # identity (eval) layout: sequential blocks, tail clamped — the
            # same padded rows/mask the replicated fused eval constructs
            cohort = self._cohort_block_data(ds)
            cohort.ensure(cohort.identity_order())
            losses, outputs = epoch_fn(
                self.params, self.state, cohort.data3,
                self._put_idx_mat(cohort.eval_mask), epoch_key,
            )
        else:
            data = self._cohort_device_data(ds)
            idx = np.arange(n_batches * b, dtype=np.int32)
            mask = (idx < n).astype(np.float32)
            idx = np.minimum(idx, n - 1)
            losses, outputs = epoch_fn(
                self.params, self.state, data,
                self._put_idx_mat(idx.reshape(n_batches, b)),
                self._put_idx_mat(mask.reshape(n_batches, b)),
                epoch_key,
            )
        if device_dumps and jax.process_count() == 1:
            if defer_losses:
                # nothing syncs this epoch: the caller holds the device
                # per-batch loss handles and fetches them at its boundary
                metrics = losses
            else:
                losses = jax.device_get(losses)
        else:
            losses, outputs = device_fetch((losses, outputs))

        if not (defer_losses and device_dumps and jax.process_count() == 1):
            metrics = {k: float(np.mean(v)) for k, v in losses.items()}
            logger.info("%d: %s-%s", self.epoch, scope, _fmt(metrics))
        dumps: Dict[str, list] = defaultdict(list)
        for k, v in outputs.items():
            # only the final batch is padded, at its end: flattening the
            # (n_batches, B, ...) stack makes rows [:n] exactly the cohort
            dumps[k].append(v.reshape((n_batches * b,) + v.shape[2:])[:n])
        dumps["__index__"].append(np.arange(n))
        return metrics, dumps

    def merge_ob_pred(
        self, ds: ArrayDataset, dumps: Dict[str, list]
    ) -> Dict[str, np.ndarray]:
        """Merge batch dumps + the raw batch planes into one dict of arrays
        (reference merge_ob_pred, pretrain_trainer.py:406-414)."""
        idx = np.concatenate(dumps.pop("__index__"))
        out: Dict[str, np.ndarray] = {
            "encounter_id": np.asarray([ds.encounter_ids[j] for j in idx]),
            "ob": ds.ob[idx].copy(),
            "padding_mask": ds.padding_mask[idx],
            "timestamp": ds.timestamp[idx],
            "ae_mask": ds.ae_mask[idx],
        }
        for k, v in ds.aux.items():
            out[k] = v[idx]
        for k, v in dumps.items():
            out[k] = np.concatenate(v, axis=0)
        return out

    def re_norm_data(self, ob_pred: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Undo the affine input scaling and the min-max normalization so
        `ob`/`rec_ob` are in physical units (reference :416-429)."""
        cfg = self.cfg
        if cfg.norm_method != "minmax":
            raise NotImplementedError(cfg.norm_method)
        for k in ("ob", "rec_ob"):
            if k not in ob_pred:  # feat_dump="lean" drops rec_ob
                continue
            data = ob_pred[k]
            if cfg.scale != 0:  # scale=0 disables the affine input scaling
                renorm = (data + cfg.scale / 2) / cfg.scale  # back to [0, 1]
            else:
                renorm = data
            for i, (lo, hi) in enumerate(MIN_MAX_VALUES.values()):
                data[:, i, :] = renorm[:, i, :] * (hi - lo) + lo
            ob_pred[k] = data
        return ob_pred

    def eval(
        self,
        cohort: str,
        generate_feat: bool = False,
        viz_feat: bool = False,
        denoise: bool = False,
        metric: Optional[str] = None,
    ) -> Dict[str, np.ndarray]:
        """Restore the best checkpoint for `metric` (default: the config's
        restore metric) and dump per-encounter features
        (reference pretrain_trainer.py:90-117). Passing `metric` explicitly
        is how callers sweep restore metrics — the jitted steps close over
        `self.cfg`, so the config must never be swapped after construction."""
        metric = metric or self.restore_metric
        self.load_weight(metric)
        ds = self.datasets[cohort]
        scope = COHORT2SCOPE[cohort]
        if self.cfg.evaluate_interpolation:
            denoise = True
        # feat_dump="lean": fetch only the keys p2/p4 read from the files
        # (Config.feat_dump) — rec_ob dominates the D2H otherwise. An
        # interpolation-evaluation dump exists FOR the reconstructions
        # (reference pretrain_trainer.py:90-117's denoise branch), so
        # evaluate_interpolation overrides lean back to the full payload.
        dump_keys = (
            None
            if self.cfg.feat_dump == "full" or self.cfg.evaluate_interpolation
            else ("hidden", "cluster_pred", "cluster_label")
        )
        metrics, dumps = self.eval_one_epoch(scope, ds, denoise, dump_keys)
        logger.info("%s %s", scope, _fmt(metrics))
        ob_pred = self.merge_ob_pred(ds, dumps)
        ob_pred = self.re_norm_data(ob_pred)

        if generate_feat and is_main_process():
            # multi-host: every process holds the full gathered dumps, but
            # only one writes (the paths may be on a shared filesystem)
            folder = os.path.join(self.exp_path, "out_feat", metric)
            os.makedirs(folder, exist_ok=True)
            suffix = "_interp_eval" if self.cfg.evaluate_interpolation else ""
            np_f = os.path.join(folder, f"{cohort}{suffix}.npy")
            np.save(np_f, ob_pred)  # dict payload, like the reference
            logger.info("features saved to %s", np_f)
        if viz_feat:
            self.summary.add_embedding(ob_pred["hidden"], self.epoch, cohort)
        return ob_pred

    # ------------------------------------------------------ aly + ckpt
    @property
    def restore_metric(self) -> str:
        return self.cfg.restore_metric

    def _ckpt_candidacy(self, metric_dict: Dict[str, float]) -> None:
        """Best-metric checkpoint candidacy for the CURRENT epoch — the
        save-on-improvement half of aly_pred (reference
        pretrain_trainer.py:126-199 semantics). Factored out so the DEC
        loop's deferred cadence can grant an early-STOPPING epoch its
        candidacy without re-stepping the LR schedule or duplicating the
        summary row (cluster_trainer.py)."""
        improved = self.flag_dict.improved(metric_dict, self.epoch)
        for m in improved if is_main_process() else []:
            path = os.path.join(self.weight_paths[m], ckpt.CKPT_NAME)
            ckpt.save_checkpoint(
                path, self.epoch, self.params, self.state, self.opt_state,
                extra={
                    "lr": self.lr_schedule.lr,
                    "metric": m,
                    "lr_schedule": self.lr_schedule.state_dict(),
                    "flag_dict": self.flag_dict.state_dict(),
                },
            )
            logger.info("saving for %s", m)

    def aly_pred(self, scope: str, metric_dict: Dict[str, float]) -> Dict:
        if scope == "valid":
            self.lr_schedule.step(metric_dict.get("loss"))
            set_learning_rate(self.opt_state, self.lr_schedule.lr)
            metric_dict["lr"] = self.lr_schedule.lr
            self._ckpt_candidacy(metric_dict)
        self.summary.add_summary(self.epoch, scope=scope, **metric_dict)
        logger.info("%s", _fmt(metric_dict))
        return {
            "early_stop": self.flag_dict.early_stop(
                self.epoch, self.cfg.early_stopping
            )
        }

    def load_weight(self, metric: Optional[str] = None) -> None:
        from ..parallel import multihost

        # multi-host: checkpoints are written by process 0 only — without a
        # barrier another process can read a best-checkpoint file that is
        # one save behind, desynchronizing the subsequent collective
        # placements (observed: two processes device_put different params
        # and the validation aborts the job)
        multihost.barrier("load_weight")
        metric = metric or self.restore_metric
        path = os.path.join(self.weight_paths[metric], ckpt.CKPT_NAME)
        if not os.path.exists(path):
            logger.error("==> load fail: no checkpoint at %s", path)
            return
        epoch, params, state, opt_state, meta = ckpt.load_checkpoint(
            path, opt_state_template=self.opt_state
        )
        self.epoch = epoch
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.state = jax.tree_util.tree_map(jnp.asarray, state)
        if opt_state is not None:
            self.opt_state = jax.tree_util.tree_map(jnp.asarray, opt_state)
        if self.mesh is not None:
            self.params = replicate_tree(self.mesh, self.params)
            self.state = replicate_tree(self.mesh, self.state)
            self.opt_state = replicate_tree(self.mesh, self.opt_state)
        if "lr_schedule" in meta:
            # full schedule state: step/warmup recompute the LR closed-form
            # from num_steps, so restoring only the rate is not enough (the
            # first resumed epoch would stomp it back to the epoch-0 value)
            self.lr_schedule.load_state_dict(meta["lr_schedule"])
            set_learning_rate(self.opt_state, self.lr_schedule.lr)
        elif "lr" in meta:  # pre-schedule-state checkpoints
            self.lr_schedule.lr = meta["lr"]
            self.lr_schedule.num_steps = epoch
            set_learning_rate(self.opt_state, meta["lr"])
        # Restore best-metric flags by min-merging EVERY metric dir's saved
        # snapshot (each checkpoint records the bests as of its own save) —
        # otherwise the first resumed epoch "improves" every metric from inf
        # and overwrites the best checkpoints with worse models. The torch
        # reference has this flaw (utils.py:126-138); resume is first-class
        # here, so we exceed it.
        for d in self.weight_paths.values():
            p = os.path.join(d, ckpt.CKPT_NAME)
            if os.path.exists(p):
                fd = ckpt.load_meta(p).get("flag_dict")
                if fd:
                    self.flag_dict.merge_state(fd)
        logger.info("=> restored checkpoint %s (epoch %d)", path, epoch)

    def close(self) -> None:
        """Release the summary writer's file handles (JSONL + TB)."""
        self.summary.close()


def _fmt(d: Dict[str, float], decimals: int = 4) -> Dict[str, float]:
    return {
        k: (round(v, decimals) if isinstance(v, float) and k != "lr" else v)
        for k, v in d.items()
    }
