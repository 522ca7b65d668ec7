"""Fused Pallas kernels vs the jnp reference ops (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.models import forward, init_net
from deep_interpolation_clustering_tpu.ops.interpolation import sci_forward
from deep_interpolation_clustering_tpu.ops.pallas_interp import (
    rbf_project_pallas,
    _rbf_jnp_reference,
    sci_forward_pallas,
)

B, C, T, R, HOURS = 4, 6, 30, 6, 6.0


def _planes(rng, b=B, t=T):
    mask = np.zeros((b, C, t), np.float32)
    for i in range(b):
        for j in range(C):
            mask[i, j, : rng.randint(2, t + 1)] = 1.0
    ob = rng.randn(b, C, t).astype(np.float32) * mask
    ts = np.sort(rng.rand(b, C, t).astype(np.float32) * HOURS, axis=-1) * mask
    return np.concatenate([ob, mask, ts, mask], axis=1)


def test_sci_pallas_matches_jnp(rng):
    x = _planes(rng)
    kernel = rng.rand(C).astype(np.float32)
    want = np.asarray(sci_forward(jnp.asarray(kernel), jnp.asarray(x), R, HOURS))
    got = np.asarray(sci_forward_pallas(jnp.asarray(kernel), jnp.asarray(x), R, HOURS))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sci_pallas_grads_match(rng):
    x = _planes(rng)
    kernel = rng.rand(C).astype(np.float32)

    def loss_ref(k, xx):
        return jnp.sum(jnp.square(sci_forward(k, xx, R, HOURS)))

    def loss_pl(k, xx):
        return jnp.sum(jnp.square(sci_forward_pallas(k, xx, R, HOURS)))

    gk_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(kernel), jnp.asarray(x))
    gk_p, gx_p = jax.grad(loss_pl, argnums=(0, 1))(jnp.asarray(kernel), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-5)


def test_rbf_pallas_matches_jnp(rng):
    x = _planes(rng)
    kernel = rng.rand(C).astype(np.float32)
    proj = rng.randn(B, C, R).astype(np.float32)
    want = np.asarray(
        _rbf_jnp_reference(jnp.asarray(kernel), jnp.asarray(proj), jnp.asarray(x), R, HOURS)
    )
    got = np.asarray(
        rbf_project_pallas(jnp.asarray(kernel), jnp.asarray(proj), jnp.asarray(x), R, HOURS)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_full_model_pallas_parity(rng):
    """forward(use_pallas=True) == forward(use_pallas=False) end to end."""
    cfg = Config(num_timestamps=T, fake_detection=False, aux_tasks={})
    params, state = init_net(jax.random.PRNGKey(0), cfg)
    x = _planes(rng)
    out_ref = forward(params, state, cfg, x, train=False)
    out_pl = forward(params, state, cfg.replace(use_pallas=True), x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_pl.hidden), np.asarray(out_ref.hidden), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_pl.rec), np.asarray(out_ref.rec), rtol=1e-5, atol=1e-6
    )


def test_sci_pallas_nondivisible_shapes(rng):
    """Row/T padding must be exact for shapes off the tile sizes."""
    x = _planes(rng, b=3, t=47)
    kernel = rng.rand(C).astype(np.float32)
    want = np.asarray(sci_forward(jnp.asarray(kernel), jnp.asarray(x), R, HOURS))
    got = np.asarray(sci_forward_pallas(jnp.asarray(kernel), jnp.asarray(x), R, HOURS))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bilstm_pallas_matches_scan(rng):
    """The fused Mosaic biLSTM recurrence (ops/pallas_lstm.py) must match
    the lax.scan path in forward AND in every gradient (params, inputs,
    initial states) — the hand-written reverse-walk backward covers
    interior h/c cotangents uniformly, not just the final-state slices.
    Interpreter mode off-TPU; kept as a measured-slower option (see
    Config.use_pallas_lstm)."""
    from jax.flatten_util import ravel_pytree

    from deep_interpolation_clustering_tpu.ops.lstm import (
        bilstm_forward,
        lstm_init,
    )

    t_len, b, feat, hidden = 6, 9, 18, 128
    params = lstm_init(jax.random.PRNGKey(1), feat, hidden)
    x = jax.random.normal(jax.random.PRNGKey(2), (t_len, b, feat))
    h0 = jax.random.normal(jax.random.PRNGKey(3), (2, b, hidden)) * 0.1
    c0 = jax.random.normal(jax.random.PRNGKey(4), (2, b, hidden)) * 0.1

    o1, h1, c1 = bilstm_forward(params, x, h0, c0, use_pallas=False)
    o2, h2, c2 = bilstm_forward(params, x, h0, c0, use_pallas=True)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=1e-6)

    def loss(params, x, h0, c0, up):
        o, h, c = bilstm_forward(params, x, h0, c0, use_pallas=up)
        # weight interior steps AND final states so both cotangent paths
        # (dys stream and the final-state slices) are exercised
        return jnp.sum(o * 1.3) + jnp.sum(h * 0.7) + jnp.sum(c * 0.3)

    g1 = jax.grad(loss, argnums=(0, 1, 2, 3))(params, x, h0, c0, False)
    g2 = jax.grad(loss, argnums=(0, 1, 2, 3))(params, x, h0, c0, True)
    f1, _ = ravel_pytree(g1)
    f2, _ = ravel_pytree(g2)
    scale = float(jnp.max(jnp.abs(f1)))
    np.testing.assert_allclose(
        np.asarray(f2), np.asarray(f1), atol=2e-6 * max(scale, 1.0)
    )


def test_full_model_pallas_lstm_parity(rng):
    """forward(use_pallas_lstm=True) == baseline end to end."""
    cfg = Config(num_timestamps=T, fake_detection=False, aux_tasks={})
    params, state = init_net(jax.random.PRNGKey(0), cfg)
    x = _planes(rng)
    out_ref = forward(params, state, cfg, x, train=False)
    out_pl = forward(params, state, cfg.replace(use_pallas_lstm=True), x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_pl.hidden), np.asarray(out_ref.hidden), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_pl.rec), np.asarray(out_ref.rec), rtol=1e-5, atol=1e-6
    )


def test_bilstm_pallas_bf16_boundary(rng):
    """Under compute_dtype='bfloat16' the Mosaic recurrence upcasts at its
    boundary (the kernel pair is f32-only) and casts back: outputs keep the
    caller's dtype, values track the bf16 scan path, and gradients flow
    without custom_vjp dtype mismatches."""
    from deep_interpolation_clustering_tpu.ops.lstm import (
        bilstm_forward,
        lstm_init,
    )

    t_len, b, feat, hidden = 6, 9, 18, 128
    params = lstm_init(jax.random.PRNGKey(1), feat, hidden)
    bf16 = jnp.bfloat16
    params16 = jax.tree.map(lambda a: a.astype(bf16), params)
    x16 = jax.random.normal(jax.random.PRNGKey(2), (t_len, b, feat), bf16)

    o1, h1, c1 = bilstm_forward(params16, x16, use_pallas=False)
    o2, h2, c2 = bilstm_forward(params16, x16, use_pallas=True)
    assert o2.dtype == bf16 and h2.dtype == bf16 and c2.dtype == bf16
    # the scan path computes gates in bf16, the kernel in f32 — agreement
    # is bounded by bf16 resolution on the tanh-bounded outputs
    np.testing.assert_allclose(
        np.asarray(o2, np.float32), np.asarray(o1, np.float32), atol=3e-2
    )

    def loss(p):
        o, h, c = bilstm_forward(p, x16, use_pallas=True)
        return jnp.sum(o.astype(jnp.float32))

    g = jax.grad(loss)(params16)
    flat = jax.tree.leaves(g)
    assert all(a.dtype == bf16 for a in flat)
    assert all(bool(jnp.all(jnp.isfinite(a.astype(jnp.float32)))) for a in flat)


def test_sci_hybrid_bwd_matches_autodiff(rng):
    """sci_forward_hybrid: identical XLA forward (parity surface intact),
    fused Pallas VJP. Gradients must match XLA autodiff to f32 rounding on
    kernel/ob/ts, and on mask at VALID slots (the jnp path NaNs mask==0
    entries via log(0); the kernel defines them as 0)."""
    from deep_interpolation_clustering_tpu.ops.interpolation import Planes
    from deep_interpolation_clustering_tpu.ops.pallas_interp import (
        sci_forward_hybrid,
    )

    b, t = 5, 37
    mask = np.zeros((b, C, t), np.float32)
    counts = rng.randint(2, t + 1, size=(b, C))
    for i in range(b):
        for j in range(C):
            mask[i, j, : counts[i, j]] = 1.0
    ob = (rng.rand(b, C, t).astype(np.float32) * 5 - 2.5) * mask
    ts = np.sort(rng.rand(b, C, t).astype(np.float32) * HOURS, axis=-1) * mask
    planes = Planes(
        jnp.asarray(ob), jnp.asarray(mask), jnp.asarray(ts), jnp.asarray(mask)
    )
    kernel = jnp.asarray(rng.rand(C).astype(np.float32))
    w = jnp.asarray(rng.randn(b, R, 3 * C).astype(np.float32))

    np.testing.assert_array_equal(
        np.asarray(sci_forward_hybrid(kernel, planes, R, HOURS)),
        np.asarray(sci_forward(kernel, planes, R, HOURS)),
    )

    g_ref = jax.grad(
        lambda k, pl: jnp.sum(sci_forward(k, pl, R, HOURS) * w), argnums=(0, 1)
    )(kernel, planes)
    g_pl = jax.grad(
        lambda k, pl: jnp.sum(sci_forward_hybrid(k, pl, R, HOURS) * w),
        argnums=(0, 1),
    )(kernel, planes)
    np.testing.assert_allclose(
        np.asarray(g_pl[0]), np.asarray(g_ref[0]), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_pl[1].ob), np.asarray(g_ref[1].ob), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_pl[1].ts), np.asarray(g_ref[1].ts), rtol=1e-5,
        atol=1e-4 * float(np.abs(np.asarray(g_ref[1].ts)).max()),
    )
    valid = mask > 0
    np.testing.assert_allclose(
        np.asarray(g_pl[1].mask)[valid], np.asarray(g_ref[1].mask)[valid],
        rtol=1e-5, atol=1e-4,
    )
    assert (np.asarray(g_pl[1].mask)[~valid] == 0).all()
    assert (np.asarray(g_pl[1].ae) == 0).all()


def test_train_step_pallas_bwd_matches(rng):
    """One full train-step gradient under use_pallas_bwd vs baseline."""
    from deep_interpolation_clustering_tpu.train.steps import (
        _forward_and_losses,
        build_inputs,
    )
    from jax.flatten_util import ravel_pytree

    cfg = Config(num_timestamps=T, batch_size=4)
    params, state = init_net(jax.random.PRNGKey(0), cfg)
    ob = (rng.rand(4, C, T).astype(np.float32) * 5 - 2.5)
    mask = np.ones((4, C, T), np.float32)
    ts = np.sort(rng.rand(4, C, T).astype(np.float32) * HOURS, axis=-1)
    batch = {
        "ob": jnp.asarray(ob), "padding_mask": jnp.asarray(mask),
        "timestamp": jnp.asarray(ts), "ae_mask": jnp.asarray(mask),
        "future_vital": jnp.asarray(rng.rand(4, C).astype(np.float32)),
        "future_vital_mask": jnp.asarray(np.ones((4, C), np.float32)),
    }
    key = jax.random.PRNGKey(7)

    def total_loss(params, cfg):
        inputs = build_inputs(cfg, batch, key, train=True, denoise=False)
        _, losses = _forward_and_losses(params, state, cfg, inputs, True, key)
        return losses["loss"]

    g0 = jax.grad(total_loss)(params, cfg)
    g1 = jax.grad(total_loss)(params, cfg.replace(use_pallas_bwd=True))
    f0, _ = ravel_pytree(g0)
    f1, _ = ravel_pytree(g1)
    scale = float(jnp.max(jnp.abs(f0)))
    np.testing.assert_allclose(
        np.asarray(f1), np.asarray(f0), atol=1e-5 * max(scale, 1.0)
    )
