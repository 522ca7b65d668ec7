"""Golden tests for the interpolation ops against independent NumPy oracles
written directly from the IPN math (masked log-space kernel smoothing;
see reference interpolation_layer.py:31-127 for the behavior contract)."""

import numpy as np
import jax.numpy as jnp

from deep_interpolation_clustering_tpu.ops.interpolation import (
    sci_forward,
    cci_forward,
    split_planes,
    reference_times,
)

B, C, T, R, HOURS = 4, 6, 30, 6, 6


def make_input(rng, b=B, c=C, t=T):
    feat = rng.randn(b, c, t).astype(np.float32)
    mask = (rng.rand(b, c, t) < 0.6).astype(np.float32)
    mask[:, :, 0] = 1.0  # ensure every channel has >=1 observation
    ts = (HOURS * rng.rand(b, c, t)).astype(np.float32)
    hold = (rng.rand(b, c, t) < 0.8).astype(np.float32)
    return np.concatenate([feat, mask, ts, hold], axis=1)


def sci_oracle(kernel, x):
    """NumPy oracle: per-channel masked kernel smoothing onto R ref points."""
    x_t = x[:, :C, :]
    mask = x[:, C : 2 * C, :]
    d = x[:, 2 * C : 3 * C, :]
    ref_t = np.linspace(0, HOURS, R, dtype=np.float64)
    alpha = np.log1p(np.exp(kernel.astype(np.float64)))

    y = np.zeros((B, C, R))
    w = np.zeros((B, C, R))
    y_trans = np.zeros((B, C, R))
    for b in range(B):
        for c in range(C):
            for r in range(R):
                norm = (d[b, c] - ref_t[r]) ** 2
                obs = mask[b, c] > 0
                for kappa, (acc_y, acc_w) in [(1.0, (y, w)), (10.0, (y_trans, None))]:
                    logits = -kappa * alpha[c] * norm[obs]
                    m = logits.max()
                    lse = m + np.log(np.sum(np.exp(logits - m)))
                    weights = np.exp(logits - lse)
                    acc_y[b, c, r] = np.sum(weights * x_t[b, c][obs])
                    if acc_w is not None:
                        acc_w[b, c, r] = lse
    rep = np.concatenate([y, w, y_trans], axis=1)  # (B, 3C, R)
    return np.transpose(rep, (0, 2, 1))


def cci_oracle(kernel, rep):
    """NumPy oracle for the cross-channel mixing layer."""
    rep = rep.astype(np.float64)
    y = rep[..., :C]
    w = rep[..., C : 2 * C]
    ytr = rep[..., 2 * C : 3 * C]
    intensity = np.exp(w)
    out_sm = np.zeros_like(y)
    for b in range(rep.shape[0]):
        for r in range(rep.shape[1]):
            e = np.exp(w[b, r] - w[b, r].max())
            sm = e / e.sum()
            mean = y[b].mean(axis=0)
            out_sm[b, r] = (sm * (y[b, r] - mean)) @ kernel + mean
    return np.concatenate([out_sm, intensity, ytr - out_sm], axis=-1)


def test_sci_matches_oracle(rng):
    x = make_input(rng)
    kernel = rng.rand(C).astype(np.float32)
    got = np.asarray(sci_forward(jnp.asarray(kernel), jnp.asarray(x), R, HOURS))
    want = sci_oracle(kernel, x)
    assert got.shape == (B, R, 3 * C)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_cci_matches_oracle(rng):
    x = make_input(rng)
    kernel = rng.rand(C).astype(np.float32)
    rep = np.asarray(sci_forward(jnp.asarray(kernel), jnp.asarray(x), R, HOURS))
    ck = (np.eye(C) + 0.01 * rng.randn(C, C)).astype(np.float32)
    got = np.asarray(cci_forward(jnp.asarray(ck), jnp.asarray(rep)))
    want = cci_oracle(ck.astype(np.float64), rep)
    assert got.shape == (B, R, 3 * C)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cci_identity_kernel_fixed_point(rng):
    """With the identity kernel and uniform intensities, smoothing reduces to
    a weighted average consistent with the softmax weights."""
    rep = np.zeros((2, R, 3 * C), dtype=np.float32)
    rep[..., :C] = rng.randn(2, R, C)
    rep[..., C : 2 * C] = 0.0  # uniform intensity -> softmax = 1/C
    out = np.asarray(cci_forward(jnp.eye(C), jnp.asarray(rep)))
    y = rep[..., :C]
    mean = y.mean(axis=1, keepdims=True)
    want = (y - mean) / C + mean
    np.testing.assert_allclose(out[..., :C], want, rtol=1e-5, atol=1e-6)


def test_single_observation_channel(rng):
    """A channel with exactly one observation must interpolate to a constant
    (its value) with no NaNs — the mean-imputation contract (p0:88-92)."""
    x = make_input(rng)
    # channel 2: keep only the first observation
    x[:, C + 2, 1:] = 0.0
    kernel = rng.rand(C).astype(np.float32)
    rep = np.asarray(sci_forward(jnp.asarray(kernel), jnp.asarray(x), R, HOURS))
    assert np.isfinite(rep[..., :C]).all()
    np.testing.assert_allclose(
        rep[:, :, 2], np.broadcast_to(x[:, 2, :1], (B, R)), rtol=1e-5
    )


def test_split_planes(rng):
    x = make_input(rng)
    f, m, t, h = split_planes(jnp.asarray(x), C)
    np.testing.assert_array_equal(np.asarray(f), x[:, :C])
    np.testing.assert_array_equal(np.asarray(h), x[:, 3 * C :])


def test_reference_times():
    ref = np.asarray(reference_times(6, 6.0))
    np.testing.assert_allclose(ref, np.linspace(0, 6, 6), rtol=1e-6)
