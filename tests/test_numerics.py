"""Unit contract of ops/numerics.py — the Newton-refined transcendentals.

On the CPU backend the platform log is already ~1 ulp, so the refinement
must be a numerical no-op here (the accuracy win is chip-only and is
measured by benchmarks/parity_ledger.py); what these tests pin down is the
part that must hold on EVERY backend: the masked-row (-inf) guards, the
stop_gradient'ed correction (gradients == the unrefined expression's), and
f64-oracle accuracy of the composite expressions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_interpolation_clustering_tpu.ops.numerics import (
    logsumexp_refined,
    softplus_refined,
)


def test_softplus_matches_f64_oracle():
    x = jnp.asarray(np.linspace(-8.0, 8.0, 101, dtype=np.float32))
    got = softplus_refined(x)
    want = np.log1p(np.exp(np.asarray(x, np.float64)))
    # atol 2e-7: for x << 0 the f32 sum 1+exp(x) absorbs low bits of
    # exp(x) — inherent to the naive formula the reference itself uses
    # (torch.log(1 + e^x)), bounded by eps(1.0)
    np.testing.assert_allclose(
        np.asarray(got, np.float64), want, rtol=3e-7, atol=2e-7
    )


def test_softplus_gradient_is_sigmoid():
    # the Newton correction is stop_gradient'ed: d/dx log(1+e^x) = sigmoid(x)
    x = jnp.asarray(np.linspace(-6.0, 6.0, 41, dtype=np.float32))
    g = jax.vmap(jax.grad(softplus_refined))(x)
    np.testing.assert_allclose(g, jax.nn.sigmoid(x), rtol=1e-6, atol=1e-7)


def test_logsumexp_matches_jax_nn():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 6, 13, 3).astype(np.float32) * 5)
    for axis in (2, 1):
        got = logsumexp_refined(logits, axis=axis)
        want = jax.nn.logsumexp(logits, axis=axis)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
        got_k = logsumexp_refined(logits, axis=axis, keepdims=True)
        assert got_k.shape == jax.nn.logsumexp(
            logits, axis=axis, keepdims=True
        ).shape


def test_logsumexp_all_masked_row_is_neg_inf_not_nan():
    # the production masking adds log(0) = -inf to unobserved positions;
    # a fully-masked row must come out -inf with no NaN anywhere
    logits = jnp.full((2, 3, 5), -jnp.inf, jnp.float32)
    logits = logits.at[0, 0].set(jnp.asarray([0.0, 1.0, -jnp.inf, 2.0, -1.0]))
    out = logsumexp_refined(logits, axis=2)
    assert not np.any(np.isnan(out))
    assert np.isneginf(np.asarray(out)[1]).all()
    np.testing.assert_allclose(
        out[0, 0], jax.nn.logsumexp(logits[0, 0]), rtol=1e-6
    )


def test_logsumexp_gradient_is_softmax_with_masked_entries():
    # gradient through partially-masked rows: the exact softmax, with the
    # -inf (masked) entries getting exactly-zero cotangents. (Fully-masked
    # rows produce NaN gradients through jax.nn.logsumexp and through this
    # refinement alike — the production padding repeats REAL rows precisely
    # to keep such rows out of the train path, parallel/mesh.py.)
    logits = jnp.asarray(
        [[0.5, -jnp.inf, 1.5], [2.0, -1.0, -jnp.inf]], jnp.float32
    )

    def f(lg):
        return jnp.sum(logsumexp_refined(lg, axis=1))

    g = jax.grad(f)(logits)
    np.testing.assert_allclose(
        g, jax.vmap(jax.nn.softmax)(logits), rtol=1e-6, atol=1e-7
    )
    assert not np.any(np.isnan(g))
    assert float(g[0, 1]) == 0.0 and float(g[1, 2]) == 0.0


def test_sci_forward_uses_refinement_without_changing_cpu_numerics():
    # end-to-end guard: on CPU the refined SCI must equal the raw-op SCI to
    # float tolerance (the parity contract lives on this backend)
    from deep_interpolation_clustering_tpu.ops import interpolation as interp

    rng = np.random.RandomState(1)
    B, C, T, R = 3, 6, 30, 6
    counts = rng.randint(3, T + 1, size=(B, C))
    mask = (np.arange(T)[None, None, :] < counts[:, :, None]).astype(np.float32)
    ob = rng.randn(B, C, T).astype(np.float32) * mask
    ts = np.sort(rng.rand(B, C, T).astype(np.float32) * 6.0, axis=-1) * mask
    x = jnp.asarray(
        np.concatenate([ob, mask, ts, np.zeros_like(ob)], axis=1)
    )
    kernel = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    out = interp.sci_forward(kernel, x, R, 6.0)
    assert not np.any(np.isnan(out))
    # raw-op mirror
    xp, mp, tp, _ = interp.to_planes(x, C)
    ref_t = interp.reference_times(R, 6.0, xp.dtype)
    diff = tp[..., None] - ref_t
    alpha = jnp.log1p(jnp.exp(kernel))
    logits = -alpha[None, :, None, None] * (diff * diff) + jnp.log(mp)[..., None]
    w = jax.nn.logsumexp(logits, axis=2)
    y = jnp.sum(jnp.exp(logits - w[:, :, None, :]) * xp[..., None], axis=2)
    lt = interp.TRANSIENT_KAPPA * (
        -alpha[None, :, None, None] * (diff * diff)
    ) + jnp.log(mp)[..., None]
    wt = jax.nn.logsumexp(lt, axis=2)
    yt = jnp.sum(jnp.exp(lt - wt[:, :, None, :]) * xp[..., None], axis=2)
    want = jnp.transpose(jnp.concatenate([y, w, yt], axis=1), (0, 2, 1))
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6)


def test_softplus_overflow_regime_matches_naive_reference_form():
    # Trust-region guard (ops/numerics.py _NEWTON_LO/HI): outside it the
    # Newton step's exp(-log s) hits f32 subnormal/overflow edges — on the
    # v5e FTZ made corr = -1.0 exactly for x in [87.3, 88.7] and NaN past
    # inf. The contract: large-x softplus equals the reference's naive
    # torch.log(1 + e^x) (≈ x while exp(x) is finite, inf past ~88.7),
    # never NaN, never off by 1.
    x = jnp.asarray([20.0, 69.0, 80.0, 87.5, 88.0, 88.6], jnp.float32)
    got = np.asarray(softplus_refined(x))
    assert not np.any(np.isnan(got))
    np.testing.assert_allclose(got, np.asarray(x), rtol=1e-6)
    big = np.asarray(softplus_refined(jnp.asarray([89.0, 500.0], jnp.float32)))
    assert np.isposinf(big).all()


def test_log_refined_extremes_no_nan():
    from deep_interpolation_clustering_tpu.ops.numerics import _log_refined

    s = jnp.asarray([0.0, 1e-35, 1.0, 1e35, np.inf], jnp.float32)
    got = np.asarray(_log_refined(s))
    assert not np.any(np.isnan(got))
    assert np.isneginf(got[0]) and np.isposinf(got[-1])
    np.testing.assert_allclose(
        got[1:4], np.log(np.asarray([1e-35, 1.0, 1e35])), rtol=1e-6, atol=1e-7
    )
