"""Optimizer and learning-rate-schedule factories (optax).

Reproduces the reference's torch factories (utils.py:77-99):
  * Adam(amsgrad=True) / SGD(momentum .9, nesterov) / RMSprop — all with L2
    weight decay folded into the gradient (torch semantics, not AdamW), and
    gradient clipping by global norm applied first
    (pretrain_trainer.py:228 `clip_grad_norm_` before `optimizer.step`).
  * LR schedules are *epoch-level* and driven by the trainer, matching the
    reference's `scheduler.step()` in `aly_pred` (pretrain_trainer.py:372-379):
    `step` (StepLR), `plateau` (ReduceLROnPlateau 'min', rel threshold 1e-4),
    `warmup` (linear multiplier ramp to 8x over 10 epochs, then a hand-off
    crash back to base LR and StepLR decay from base — the measured
    GradualWarmupScheduler+StepLR trajectory, see tests/test_warmup_oracle.py).
    The post-step LR is clamped to `min_lr`.

The learning rate is injected as an optax hyperparameter so the epoch driver
mutates it between epochs without recompiling the jitted train step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax

from ..config import Config


class ScaleByTorchAmsgradState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates
    nu_max: optax.Updates


def scale_by_torch_amsgrad(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """torch.optim.Adam(amsgrad=True) semantics, exactly.

    torch maxes the RAW second moment and divides the maxed value's sqrt by
    sqrt(bias_correction2) (torch adam: `denom = max_exp_avg_sq.sqrt() /
    bc2_sqrt + eps`). optax.scale_by_amsgrad instead maxes the
    bias-CORRECTED moment — the two diverge from step 2 onward whenever
    squared-gradient magnitudes decay (the usual case), because an early
    large nu/(1-b2^1) dominates the corrected max forever while torch's raw
    max gets re-corrected by the growing (1-b2^t). Trained-model parity vs
    the reference (utils.py:77-83) needs the torch form."""

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return ScaleByTorchAmsgradState(
            count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros(), nu_max=zeros()
        )

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g), state.nu, updates
        )
        nu_max = jax.tree_util.tree_map(jnp.maximum, state.nu_max, nu)
        count = optax.safe_increment(state.count)
        bc1 = 1.0 - jnp.power(b1, count)
        bc2_sqrt = jnp.sqrt(1.0 - jnp.power(b2, count))
        out = jax.tree_util.tree_map(
            lambda m, vmax: (m / bc1) / (jnp.sqrt(vmax) / bc2_sqrt + eps),
            mu, nu_max,
        )
        return out, ScaleByTorchAmsgradState(count=count, mu=mu, nu=nu, nu_max=nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def _flat_params_wrapper(
    inner: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Run `inner` on ONE raveled parameter vector instead of 37 leaves.

    The update math is elementwise (plus a global grad norm, which is the
    same sum of squares either way), so results are unchanged — but XLA
    then emits a handful of fused ops over one contiguous 0.65M-float
    array instead of per-leaf chains, cutting the optimizer's share of the
    latency-bound train step (~41 us/step measured before flattening)."""
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return inner.init(flat)

    def update(updates, state, params=None):
        gflat, unravel = ravel_pytree(updates)
        pflat = ravel_pytree(params)[0] if params is not None else None
        uflat, state = inner.update(gflat, state, pflat)
        return unravel(uflat), state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    def build(learning_rate):
        txs = []
        if cfg.grad_clip and cfg.grad_clip > 0:
            txs.append(optax.clip_by_global_norm(cfg.grad_clip))
        if cfg.weight_decay_rate:
            # torch couples weight decay into the gradient before the
            # moment updates (L2, not decoupled AdamW)
            txs.append(optax.add_decayed_weights(cfg.weight_decay_rate))
        name = cfg.optimizer.lower()
        if name == "adam":
            txs.append(scale_by_torch_amsgrad(b1=0.9, b2=0.999, eps=1e-8))
        elif name == "sgd":
            txs.append(optax.trace(decay=0.9, nesterov=True))
        elif name == "rmsprop":
            # eps_in_sqrt=False: torch.optim.RMSprop divides by sqrt(nu)+eps,
            # optax's default divides by sqrt(nu+eps)
            txs.append(optax.scale_by_rms(decay=0.99, eps=1e-8, eps_in_sqrt=False))
            txs.append(optax.trace(decay=0.9, nesterov=False))
        else:
            raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
        txs.append(optax.scale_by_learning_rate(learning_rate))
        return _flat_params_wrapper(optax.chain(*txs))

    return optax.inject_hyperparams(build)(learning_rate=cfg.init_lr)


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected learning-rate hyperparameter in place.

    The leaf stays a float32 array so the jitted step never retraces."""
    import jax.numpy as jnp

    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class LRSchedule:
    """Epoch-level LR controller with the reference's step/plateau/warmup
    semantics. `step(valid_loss)` is called once per epoch *after*
    validation; `lr` is the rate for the next epoch, already min-clamped."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.lr = cfg.init_lr
        self.num_steps = 0
        # plateau state (torch ReduceLROnPlateau defaults: mode='min',
        # threshold=1e-4, threshold_mode='rel')
        self._best = float("inf")
        self._num_bad = 0

    def step(self, valid_loss: Optional[float] = None) -> float:
        cfg = self.cfg
        self.num_steps += 1
        e = self.num_steps  # completed epochs
        mode = cfg.lr_decay_mode
        if mode == "step":
            k = e // cfg.lr_decay_step_or_patience
            self.lr = cfg.init_lr * cfg.lr_decay_rate**k
        elif mode == "warmup":
            m, total = cfg.warmup_multiplier, cfg.warmup_epochs
            if e <= total:
                self.lr = cfg.init_lr * (1.0 + (m - 1.0) * e / total)
            else:
                # Measured GradualWarmupScheduler + StepLR behavior (the
                # packages behind reference utils.py:95, oracle-tested in
                # tests/test_warmup_oracle.py), which differs from the naive
                # reading in two ways:
                #   * the hand-off step writes the after-scheduler's stale
                #     pre-warmup _last_lr, so the LR CRASHES from
                #     multiplier*base back to base after the ramp;
                #   * torch's StepLR (>=1.1) decays the *current* optimizer
                #     LR recursively, so the multiplied base_lrs the package
                #     installs never take effect, and its epoch counter only
                #     starts after the hand-off — decays fire at
                #     e = total + 1 + k*step from the BASE lr.
                k = (e - total - 1) // cfg.lr_decay_step_or_patience
                self.lr = cfg.init_lr * cfg.lr_decay_rate**k
        elif mode == "plateau":
            assert valid_loss is not None
            if valid_loss < self._best * (1.0 - 1e-4):
                self._best = valid_loss
                self._num_bad = 0
            else:
                self._num_bad += 1
            if self._num_bad > cfg.lr_decay_step_or_patience:
                self.lr = self.lr * cfg.lr_decay_rate
                self._num_bad = 0
        else:
            raise ValueError(f"unknown lr_decay_mode {mode!r}")
        # min-LR clamp (reference pretrain_trainer.py:377-379)
        if self.lr < cfg.min_lr:
            self.lr = cfg.min_lr
        return self.lr

    def state_dict(self) -> dict:
        """Checkpointable schedule state. Without it a resumed 'step'/
        'warmup' run recomputes the closed-form LR with num_steps restarted
        at 0 (a jump back to init_lr after the first resumed epoch), and
        'plateau' loses its best/bad-epoch counters."""
        return {
            "lr": self.lr,
            "num_steps": self.num_steps,
            "best": self._best,
            "num_bad": self._num_bad,
        }

    def load_state_dict(self, d: dict) -> None:
        self.lr = float(d["lr"])
        self.num_steps = int(d["num_steps"])
        self._best = float(d["best"])
        self._num_bad = int(d["num_bad"])
