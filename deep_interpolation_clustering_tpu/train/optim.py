"""Optimizer and learning-rate-schedule factories (optax).

Reproduces the reference's torch factories (utils.py:77-99):
  * Adam(amsgrad=True) / SGD(momentum .9, nesterov) / RMSprop — all with L2
    weight decay folded into the gradient (torch semantics, not AdamW), and
    gradient clipping by global norm applied first
    (pretrain_trainer.py:228 `clip_grad_norm_` before `optimizer.step`).
  * LR schedules are *epoch-level* and driven by the trainer, matching the
    reference's `scheduler.step()` in `aly_pred` (pretrain_trainer.py:372-379):
    `step` (StepLR), `plateau` (ReduceLROnPlateau 'min', rel threshold 1e-4),
    `warmup` (linear multiplier ramp to 8x over 10 epochs, then StepLR).
    The post-step LR is clamped to `min_lr`.

The learning rate is injected as an optax hyperparameter so the epoch driver
mutates it between epochs without recompiling the jitted train step.
"""

from __future__ import annotations

from typing import Optional

import optax

from ..config import Config


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
            txs.append(optax.scale_by_amsgrad(b1=0.9, b2=0.999, eps=1e-8))
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
        return optax.chain(*txs)

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
                k = (e - total) // cfg.lr_decay_step_or_patience
                self.lr = cfg.init_lr * m * cfg.lr_decay_rate**k
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
