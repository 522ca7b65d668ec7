"""RBF decoder and biLSTM parity tests.

The biLSTM and BatchNorm are checked against torch (CPU) with weights copied
into the pytrees — the same-weights-in -> same-outputs-out parity contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_interpolation_clustering_tpu.ops import nn as dnn
from deep_interpolation_clustering_tpu.ops.lstm import bilstm_forward, lstm_init
from deep_interpolation_clustering_tpu.ops.rbf import rbf_decode, rbf_init, basis_func_dict

torch = pytest.importorskip("torch")

B, C, T, R, HOURS, H = 3, 6, 25, 6, 6, 16


def test_bilstm_matches_torch(rng):
    """Forward + initial-state seeding vs torch nn.LSTM(bidirectional)."""
    IN = 18
    x = rng.randn(R, B, IN).astype(np.float32)
    tl = torch.nn.LSTM(IN, H, num_layers=1, bidirectional=True)
    params = {
        "fwd": {
            "w_ih": jnp.asarray(tl.weight_ih_l0.detach().numpy()),
            "w_hh": jnp.asarray(tl.weight_hh_l0.detach().numpy()),
            "b_ih": jnp.asarray(tl.bias_ih_l0.detach().numpy()),
            "b_hh": jnp.asarray(tl.bias_hh_l0.detach().numpy()),
        },
        "bwd": {
            "w_ih": jnp.asarray(tl.weight_ih_l0_reverse.detach().numpy()),
            "w_hh": jnp.asarray(tl.weight_hh_l0_reverse.detach().numpy()),
            "b_ih": jnp.asarray(tl.bias_ih_l0_reverse.detach().numpy()),
            "b_hh": jnp.asarray(tl.bias_hh_l0_reverse.detach().numpy()),
        },
    }
    with torch.no_grad():
        t_out, (t_h, t_c) = tl(torch.from_numpy(x))
    out, h, c = bilstm_forward(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), t_h.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), t_c.numpy(), rtol=1e-5, atol=1e-5)

    # now with a non-zero initial state (decoder path)
    h0 = rng.randn(2, B, H).astype(np.float32)
    c0 = rng.randn(2, B, H).astype(np.float32)
    with torch.no_grad():
        t_out2, _ = tl(torch.from_numpy(x), (torch.from_numpy(h0), torch.from_numpy(c0)))
    out2, _, _ = bilstm_forward(params, jnp.asarray(x), jnp.asarray(h0), jnp.asarray(c0))
    np.testing.assert_allclose(np.asarray(out2), t_out2.numpy(), rtol=1e-5, atol=1e-5)


def test_batchnorm_matches_torch(rng):
    x = rng.randn(64, 32).astype(np.float32)
    tbn = torch.nn.BatchNorm1d(32)
    p = {"gamma": jnp.asarray(tbn.weight.detach().numpy()),
         "beta": jnp.asarray(tbn.bias.detach().numpy())}
    s = {"mean": jnp.zeros(32), "var": jnp.ones(32)}

    # train mode: batch stats + running-stat update
    tbn.train()
    t_y = tbn(torch.from_numpy(x)).detach().numpy()
    y, s2 = dnn.batchnorm_apply(p, s, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(y), t_y, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s2["mean"]), tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s2["var"]), tbn.running_var.numpy(), rtol=1e-4, atol=1e-5
    )

    # eval mode: running stats
    tbn.eval()
    x2 = rng.randn(10, 32).astype(np.float32)
    t_y2 = tbn(torch.from_numpy(x2)).detach().numpy()
    y2, _ = dnn.batchnorm_apply(p, s2, jnp.asarray(x2), train=False)
    np.testing.assert_allclose(np.asarray(y2), t_y2, rtol=1e-4, atol=1e-5)


def rbf_oracle(params, interp, x, train=False):
    """NumPy oracle of the RBF decode path (dropout off)."""
    kernel = np.asarray(params["kernel"], dtype=np.float64)
    m = x[:, C : 2 * C, :]
    t_obs = x[:, 2 * C : 3 * C, :]
    ref_t = np.linspace(0, HOURS, R)
    beta = np.log1p(np.exp(kernel))
    dist = np.abs(t_obs[..., None] - ref_t)
    phi = np.exp(-beta[None, :, None, None] * dist**2) * m[..., None]
    norm = phi.sum(-1)

    # compress head (linear -> BN(eval) -> relu -> linear)
    flat = interp.reshape(-1, interp.shape[-1]).astype(np.float64)
    cp = params["compress"]
    h = flat @ np.asarray(cp["fc1"]["w"]).T.astype(np.float64) + np.asarray(cp["fc1"]["b"])
    h = (h - 0.0) / np.sqrt(1.0 + 1e-5) * np.asarray(cp["bn"]["gamma"]) + np.asarray(cp["bn"]["beta"])
    h = np.maximum(h, 0)
    proj = h @ np.asarray(cp["fc2"]["w"]).T.astype(np.float64) + np.asarray(cp["fc2"]["b"])
    proj = proj.reshape(interp.shape[0], R, C).transpose(0, 2, 1)
    y = (phi * proj[:, :, None, :]).sum(-1)
    return y / (norm + 1e-10) * m


def test_rbf_decode_matches_oracle(rng):
    key = jax.random.PRNGKey(0)
    params, state = rbf_init(key, 2 * H, C)
    interp = rng.randn(B, R, 2 * H).astype(np.float32)
    feat = rng.randn(B, C, T).astype(np.float32)
    mask = (rng.rand(B, C, T) < 0.5).astype(np.float32)
    ts = (HOURS * rng.rand(B, C, T)).astype(np.float32)
    hold = np.ones_like(mask)
    x = np.concatenate([feat, mask, ts, hold], axis=1)

    got, _ = rbf_decode(
        params, state, jnp.asarray(interp), jnp.asarray(x), R, HOURS,
        dropout_rate=0.0, train=False,
    )
    want = rbf_oracle(params, interp, x)
    assert got.shape == (B, C, T)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    # masked positions are exactly zero
    assert np.all(np.asarray(got)[mask == 0] == 0.0)


def test_basis_library_complete():
    bases = basis_func_dict()
    assert len(bases) == 11
    a = jnp.asarray([[0.5, 1.0]])
    beta = jnp.asarray(1.3)
    for name, fn in bases.items():
        out = fn(beta, a)
        assert out.shape == a.shape, name
        assert np.isfinite(np.asarray(out)).all(), name


def test_dropout_semantics(rng):
    x = jnp.ones((1000, 10))
    key = jax.random.PRNGKey(1)
    y = dnn.dropout(key, x, 0.4, train=True)
    arr = np.asarray(y)
    # kept units scaled by 1/(1-p); expectation preserved
    kept = arr[arr != 0]
    np.testing.assert_allclose(kept, 1.0 / 0.6, rtol=1e-5)
    assert abs(arr.mean() - 1.0) < 0.05
    np.testing.assert_array_equal(
        np.asarray(dnn.dropout(key, x, 0.4, train=False)), np.ones_like(arr)
    )
