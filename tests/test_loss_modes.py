"""Every loss-mode string of the reference dispatches and trains.

The reference supports 9 loss-name strings across its two trainers
(pretrain_trainer.py:197-221, clustering_trainer.py:228-272); each maps to a
component set here. One jitted step per mode must compile and produce finite
losses with the right keys — including denoise, augmentation, and the
triplet branch.
"""

import numpy as np
import pytest

import jax

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.models import init_net
from deep_interpolation_clustering_tpu.train import make_optimizer, make_train_step

B, C, T = 8, 6, 16


def _batch(rng):
    mask = np.zeros((B, C, T), np.float32)
    for i in range(B):
        for j in range(C):
            mask[i, j, : rng.randint(2, T + 1)] = 1.0
    return {
        "ob": (rng.rand(B, C, T).astype(np.float32) * 5 - 2.5) * mask,
        "padding_mask": mask,
        "timestamp": np.sort(rng.rand(B, C, T).astype(np.float32) * 6, -1) * mask,
        "ae_mask": mask * (rng.rand(B, C, T) > 0.2).astype(np.float32),
        "future_vital": rng.rand(B, C).astype(np.float32),
        "future_vital_mask": (rng.rand(B, C) < 0.9).astype(np.float32),
        "AKI_overall": rng.randint(0, 2, B).astype(np.float32),
    }


MODES = [
    # (loss string, clustering?, expected loss keys)
    ("ae_mse", False, {"loss", "ae_mse"}),
    ("ae_mse_sup", False, {"loss", "ae_mse", "future_vital"}),
    ("ae_mse_fake_detect", False, {"loss", "ae_mse", "fake_detection"}),
    ("ae_mse_fake_detect_triplet", False, {"loss", "fake_detection", "triplet"}),
    ("ae_mse_sup_fake_detect", False, {"loss", "future_vital", "fake_detection"}),
    ("ae_mse_kl", True, {"loss", "ae_mse", "kl"}),
    ("ae_mse_sup_kl", True, {"loss", "future_vital", "kl"}),
    ("ae_mse_fake_detect_kl", True, {"loss", "fake_detection", "kl"}),
    ("ae_mse_sup_fake_detect_kl", True, {"loss", "future_vital", "fake_detection", "kl"}),
]


@pytest.mark.parametrize("loss,clustering,keys", MODES)
def test_loss_mode_trains(rng, loss, clustering, keys):
    cfg = Config(
        num_timestamps=T,
        batch_size=B,
        loss=loss,
        triple_margin=1.0 if "triplet" in loss else 0.0,
        aux_tasks={"future_vital": 0.5, "AKI_overall": 0.3} if "_sup" in loss else {"future_vital": 0.5},
        aug_input=True,
        denoise=True,
    )
    params, state = init_net(jax.random.PRNGKey(0), cfg, clustering=clustering)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, denoise=cfg.denoise)
    params, state, opt_state, losses = step(
        params, state, opt_state, _batch(rng), jax.random.PRNGKey(1)
    )
    losses = jax.device_get(losses)
    assert keys <= set(losses), f"{loss}: missing {keys - set(losses)}"
    for k, v in losses.items():
        assert np.isfinite(v), f"{loss}: {k} not finite"
    if "_sup" in loss:
        assert "AKI_overall" in losses  # binary BCE task rides along


def test_bfloat16_compute_mode(rng):
    """Mixed precision: bf16 forward, f32 grads/optimizer/metrics; the loss
    lands near the f32 value."""
    batch = _batch(rng)
    losses = {}
    for dtype in ("float32", "bfloat16"):
        cfg = Config(num_timestamps=T, batch_size=B, compute_dtype=dtype)
        params, state = init_net(jax.random.PRNGKey(0), cfg)
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        step = make_train_step(cfg, opt, denoise=False)
        new_params, _, _, l = step(params, state, opt_state, batch, jax.random.PRNGKey(1))
        losses[dtype] = float(l["loss"])
        # optimizer state and params stay float32
        assert jax.tree_util.tree_leaves(new_params)[0].dtype == np.float32
    assert abs(losses["bfloat16"] - losses["float32"]) / losses["float32"] < 0.05


def test_step_timer_and_memory_stats(rng):
    from deep_interpolation_clustering_tpu.utils import StepTimer, device_memory_stats

    cfg = Config(num_timestamps=T, batch_size=B)
    params, state = init_net(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, denoise=False)
    timer = StepTimer("train")
    b = _batch(rng)
    for i in range(3):
        timer.start()
        params, state, opt_state, losses = step(params, state, opt_state, b, jax.random.PRNGKey(i))
        timer.stop(losses)
    s = timer.summary()
    assert s["count"] == 3 and s["mean_ms"] > 0
    device_memory_stats()  # must not raise anywhere
