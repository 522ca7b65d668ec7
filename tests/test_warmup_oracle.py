"""Warmup-schedule exactness vs the real GradualWarmupScheduler trajectory.

The reference's 'warmup' mode is `GradualWarmupScheduler(multiplier=8,
total_epoch=10, after_scheduler=StepLR)` from the `warmup-scheduler` pip
package (reference utils.py:18, 86-99), stepped once per epoch after
validation (pretrain_trainer.py:372-375). The package isn't installable
here, so this file vendors its published algorithm (ildoonet
pytorch-gradual-warmup-lr) as an oracle driven by REAL torch optimizer +
StepLR machinery, and asserts `LRSchedule(warmup)` reproduces the epoch->lr
table exactly — including the two non-obvious boundary behaviors:

  * the hand-off step (epoch total+1) returns the after-scheduler's stale
    pre-warmup `_last_lr`, so one epoch runs at the base LR;
  * the StepLR epoch counter only starts advancing after that hand-off, so
    post-warmup decays land one epoch later than the naive (e - total)//step.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.train.optim import LRSchedule


class _GradualWarmupOracle(torch.optim.lr_scheduler.LRScheduler):
    """Faithful re-implementation of the public GradualWarmupScheduler
    (ildoonet/pytorch-gradual-warmup-lr): lr ramps linearly from base_lr to
    multiplier*base_lr over total_epoch epochs, then delegates to
    after_scheduler whose base_lrs are re-seeded to multiplier*base_lr."""

    def __init__(self, optimizer, multiplier, total_epoch, after_scheduler=None):
        self.multiplier = multiplier
        if self.multiplier < 1.0:
            raise ValueError("multiplier should be >= 1.")
        self.total_epoch = total_epoch
        self.after_scheduler = after_scheduler
        self.finished = False
        super().__init__(optimizer)

    def get_lr(self):
        if self.last_epoch > self.total_epoch:
            if self.after_scheduler:
                if not self.finished:
                    self.after_scheduler.base_lrs = [
                        base_lr * self.multiplier for base_lr in self.base_lrs
                    ]
                    self.finished = True
                return self.after_scheduler.get_last_lr()
            return [base_lr * self.multiplier for base_lr in self.base_lrs]
        if self.multiplier == 1.0:
            return [
                base_lr * (float(self.last_epoch) / self.total_epoch)
                for base_lr in self.base_lrs
            ]
        return [
            base_lr
            * ((self.multiplier - 1.0) * self.last_epoch / self.total_epoch + 1.0)
            for base_lr in self.base_lrs
        ]

    def step(self, epoch=None):
        if self.finished and self.after_scheduler:
            self.after_scheduler.step(epoch)
            self._last_lr = self.after_scheduler.get_last_lr()
        else:
            super().step(epoch)


def _oracle_trajectory(init_lr, multiplier, total, step_size, gamma, min_lr, n):
    """lr actually used during epochs 1..n, with the reference's driver
    semantics: construct both schedulers, then per epoch read the optimizer
    lr, step the scheduler, min-LR clamp the param group
    (pretrain_trainer.py:372-379)."""
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=init_lr)
    after = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size, gamma=gamma)
    sched = _GradualWarmupOracle(opt, multiplier, total, after_scheduler=after)
    lrs = []
    for _ in range(n):
        lrs.append(opt.param_groups[0]["lr"])
        sched.step()
        if opt.param_groups[0]["lr"] < min_lr:
            opt.param_groups[0]["lr"] = min_lr
    return lrs


def _ours_trajectory(cfg, n):
    """lr used during epochs 1..n under our epoch driver: epoch e trains at
    `schedule.lr`, then `step()` advances it (trainer.aly_pred)."""
    s = LRSchedule(cfg)
    lrs = []
    for _ in range(n):
        lrs.append(s.lr)
        s.step()
    return lrs


@pytest.mark.parametrize(
    "init_lr,mult,total,step_size,gamma",
    [
        (3e-3, 8, 10, 20, 0.2),  # the reference's p1/p3 defaults
        (1e-2, 8, 10, 5, 0.5),   # decays land fast enough to cross min_lr
        (1.0, 2, 4, 3, 0.1),     # small everything: every boundary visited
    ],
)
def test_warmup_matches_gradual_warmup_scheduler(init_lr, mult, total, step_size, gamma):
    min_lr = init_lr * 1e-3
    n = total + 4 * step_size + 5
    oracle = _oracle_trajectory(init_lr, mult, total, step_size, gamma, min_lr, n)
    cfg = Config(
        init_lr=init_lr, lr_decay_mode="warmup", warmup_multiplier=mult,
        warmup_epochs=total, lr_decay_step_or_patience=step_size,
        lr_decay_rate=gamma, min_lr=min_lr,
    )
    ours = _ours_trajectory(cfg, n)
    np.testing.assert_allclose(ours, oracle, rtol=1e-12, atol=0.0)


def test_warmup_handoff_crashes_to_base_lr():
    """The quirks, pinned explicitly: after the ramp peaks at multiplier*
    base, the hand-off writes the after-scheduler's stale pre-warmup lr
    (base), and torch's StepLR — recursive on the CURRENT lr since 1.1 —
    then decays from base, never from the multiplied base_lrs the package
    installs; its counter starts at the hand-off, so the first decay lands
    at epoch total + 2 + step."""
    cfg = Config(
        init_lr=1.0, lr_decay_mode="warmup", warmup_multiplier=8,
        warmup_epochs=10, lr_decay_step_or_patience=20, lr_decay_rate=0.2,
        min_lr=1e-6,
    )
    lrs = _ours_trajectory(cfg, 40)
    assert lrs[0] == 1.0                  # epoch 1: construction lr
    assert lrs[10] == pytest.approx(8.0)  # epoch 11: ramp complete
    assert lrs[11] == pytest.approx(1.0)  # epoch 12: hand-off crash to base
    assert lrs[12] == pytest.approx(1.0)  # epoch 13: StepLR phase, from base
    assert lrs[30] == pytest.approx(1.0)  # epoch 31: still pre-decay
    assert lrs[31] == pytest.approx(0.2)  # epoch 32: first x0.2 decay


def test_plateau_matches_torch_reduce_on_plateau():
    """'plateau' mode against the real torch ReduceLROnPlateau (mode='min',
    default rel threshold 1e-4) driven per epoch with a noisy loss curve
    (reference utils.py:90-92, 119-124)."""
    init_lr, patience, factor, n = 1.0, 2, 0.5, 40
    rng = np.random.RandomState(3)
    # plateaus then improvements: exercises bad-epoch counting and resets
    losses = np.concatenate([
        np.linspace(1.0, 0.5, 8),          # steady improvement
        np.full(10, 0.5),                   # hard plateau
        np.linspace(0.499, 0.45, 5),        # slow improvement near threshold
        0.45 + np.abs(rng.randn(n - 23)) * 1e-5,  # sub-threshold noise
    ])
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=init_lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, "min", factor=factor, patience=patience
    )
    oracle = []
    for e in range(n):
        oracle.append(opt.param_groups[0]["lr"])
        sched.step(float(losses[e]))
    cfg = Config(
        init_lr=init_lr, lr_decay_mode="plateau",
        lr_decay_step_or_patience=patience, lr_decay_rate=factor, min_lr=0.0,
    )
    s = LRSchedule(cfg)
    ours = []
    for e in range(n):
        ours.append(s.lr)
        s.step(float(losses[e]))
    np.testing.assert_allclose(ours, oracle, rtol=1e-12, atol=0.0)


def test_step_matches_torch_steplr():
    """'step' mode against the real torch StepLR under the same driver."""
    init_lr, step_size, gamma, n = 1.0, 4, 0.3, 20
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=init_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size, gamma=gamma)
    oracle = []
    for _ in range(n):
        oracle.append(opt.param_groups[0]["lr"])
        sched.step()
    cfg = Config(
        init_lr=init_lr, lr_decay_mode="step",
        lr_decay_step_or_patience=step_size, lr_decay_rate=gamma, min_lr=0.0,
    )
    ours = _ours_trajectory(cfg, n)
    np.testing.assert_allclose(ours, oracle, rtol=1e-12, atol=0.0)
