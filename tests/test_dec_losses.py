"""DEC ops and loss-function parity vs torch functional implementations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_interpolation_clustering_tpu.config import Config
from deep_interpolation_clustering_tpu.models import losses
from deep_interpolation_clustering_tpu.ops.dec import (
    centers_init,
    soft_assignment,
    target_distribution,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def test_soft_assignment_oracle(rng):
    z = rng.randn(8, 16).astype(np.float32)
    mu = rng.randn(3, 16).astype(np.float32)
    q = np.asarray(soft_assignment(jnp.asarray(mu), jnp.asarray(z), 1.0))
    # oracle: student-t with alpha=1
    d2 = ((z[:, None, :] - mu[None]) ** 2).sum(-1)
    num = (1.0 / (1.0 + d2)) ** 1.0
    want = num / num.sum(1, keepdims=True)
    np.testing.assert_allclose(q, want, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(q.sum(1), 1.0, rtol=1e-5)


def test_target_distribution_oracle(rng):
    q = rng.rand(8, 3).astype(np.float32)
    q = q / q.sum(1, keepdims=True)
    p = np.asarray(target_distribution(jnp.asarray(q)))
    w = q**2 / q.sum(0)
    want = (w.T / w.sum(1)).T
    np.testing.assert_allclose(p, want, rtol=1e-5, atol=1e-6)


def test_centers_init_bounds():
    c = np.asarray(centers_init(jax.random.PRNGKey(0), 4, 256))
    bound = np.sqrt(6.0 / (4 + 256))
    assert np.abs(c).max() <= bound
    assert c.std() > 0.3 * bound  # actually spread out


def test_kl_loss_matches_torch(rng):
    q = rng.rand(16, 4).astype(np.float32)
    q = q / q.sum(1, keepdims=True)
    p = rng.rand(16, 4).astype(np.float32)
    p = p / p.sum(1, keepdims=True)
    got = float(losses.kl_loss(jnp.asarray(p), jnp.asarray(q))["kl"])
    want = float(
        F.kl_div(torch.from_numpy(q).log(), torch.from_numpy(p), reduction="batchmean")
    )
    assert abs(got - want) < 1e-5


def test_bce_with_logits_matches_torch(rng):
    logits = rng.randn(32).astype(np.float32)
    y = (rng.rand(32) < 0.3).astype(np.float32)
    for pw in (1.0, 6.0):
        got = float(losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(y), pw))
        want = float(
            F.binary_cross_entropy_with_logits(
                torch.from_numpy(logits), torch.from_numpy(y),
                pos_weight=torch.tensor(pw),
            )
        )
        assert abs(got - want) < 5e-5, pw


def test_fake_det_loss_matches_torch(rng):
    logp = np.log(np.maximum(rng.rand(16, 2), 1e-3)).astype(np.float32)
    label = (rng.rand(16) < 0.5).astype(np.int64)
    got = float(
        losses.fake_det_loss(jnp.asarray(label), jnp.asarray(logp))["fake_detection"]
    )
    want = float(F.nll_loss(torch.from_numpy(logp), torch.from_numpy(label)))
    assert abs(got - want) < 1e-5


def test_triplet_loss_matches_torch(rng):
    a = rng.randn(8, 32).astype(np.float32)
    p = rng.randn(8, 32).astype(np.float32)
    n = rng.randn(8, 32).astype(np.float32)
    got = float(
        losses.triplet_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), 1.0)["triplet"]
    )
    want = float(
        F.triplet_margin_loss(
            torch.from_numpy(a), torch.from_numpy(p), torch.from_numpy(n), margin=1.0
        )
    )
    assert abs(got - want) < 1e-5


def test_rec_loss_masked(rng):
    ob = rng.randn(4, 6, 10).astype(np.float32)
    rec = rng.randn(4, 6, 10).astype(np.float32)
    mask = (rng.rand(4, 6, 10) < 0.5).astype(np.float32)
    got = float(losses.rec_loss(jnp.asarray(ob), jnp.asarray(rec), jnp.asarray(mask))["ae_mse"])
    want = (((rec - ob) * mask) ** 2).sum() / mask.sum()
    assert abs(got - want) < 1e-5


def test_loss_components_parsing():
    cases = {
        "ae_mse": frozenset(),
        "ae_mse_sup": {"sup"},
        "ae_mse_fake_detect": {"fake"},
        "ae_mse_fake_detect_triplet": {"fake", "triplet"},
        "ae_mse_sup_fake_detect": {"sup", "fake"},
        "ae_mse_kl": {"kl"},
        "ae_mse_fake_detect_kl": {"fake", "kl"},
        "ae_mse_sup_kl": {"sup", "kl"},
        "ae_mse_sup_fake_detect_kl": {"sup", "fake", "kl"},
    }
    for name, want in cases.items():
        assert Config(loss=name).loss_components == frozenset(want), name


def test_multi_task_weighting():
    rec = {"loss": jnp.asarray(1.0), "ae_mse": jnp.asarray(1.0)}
    aux = {"future_vital": jnp.asarray(2.0), "fake_detection": jnp.asarray(3.0)}
    out = losses.multi_task_loss({"future_vital": 0.5, "fake_detection": 1.0}, rec, aux)
    assert abs(float(out["loss"]) - (1.0 + 0.5 * 2.0 + 1.0 * 3.0)) < 1e-6
    assert float(out["ae_mse"]) == 1.0
