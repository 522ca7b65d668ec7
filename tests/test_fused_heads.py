"""Fused head trunks (`Config.fused_heads`) match the unfused path.

`ops/nn.heads_apply_fused` runs every head's Linear->BN->[ReLU]->Dropout->
Linear trunk as one batched chain. The contract: with dropout off, eval
mode is bit-identical to the unfused per-head path, and train mode (batch
BN statistics computed via the indicator matmul) agrees to f32 reduction-
order drift (~1e-7 observed, asserted 1e-5). The flag is OFF by default
(measured slower on the real chip — see the config.py comment); this test
keeps the option correct.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from deep_interpolation_clustering_tpu.config import Config
from deep_interpolation_clustering_tpu.models import net


def _toy_batch(cfg, b=16, t=48):
    c = cfg.num_variables
    kx, km, kf, kp, kk = jax.random.split(jax.random.PRNGKey(1), 5)
    m = (jax.random.uniform(km, (b, c, t)) > 0.3).astype(jnp.float32)
    x = jax.random.normal(kx, (b, 3 * c, t)).at[:, c : 2 * c, :].set(m)
    fake_x = jax.random.normal(kf, (b, 3 * c, t)).at[:, c : 2 * c, :].set(m)
    pos_x = jax.random.normal(kp, (b, 3 * c, t)).at[:, c : 2 * c, :].set(m)
    perm = jax.random.permutation(kk, 2 * b)
    return x, fake_x, pos_x, perm, kk


@pytest.mark.parametrize("train", [False, True])
def test_fused_heads_matches_unfused(train):
    # all four heads live: rbf compress + future + aux + fake_det, plus
    # the triplet branch and the DEC head
    cfg = Config(
        aux_tasks={"future_vital": 0.5, "mort": 1.0, "rein": 1.0},
        triple_margin=1.0,
        dropout=0.0,  # dropout patterns differ by design; zero it to compare
    )
    params, state = net.init_net(jax.random.PRNGKey(0), cfg, clustering=True)
    x, fake_x, pos_x, perm, key = _toy_batch(cfg)

    outs = {}
    for fused in (False, True):
        c2 = dataclasses.replace(cfg, fused_heads=fused)
        outs[fused] = net.forward(
            params, state, c2, x, fake_x, perm, pos_x, train=train, key=key
        )
    o0, o1 = outs[False], outs[True]

    tol = 0.0 if not train else 1e-5  # train: BN batch stats via matmul
    assert float(jnp.max(jnp.abs(o0.rec - o1.rec))) <= tol
    assert set(o0.aux) == set(o1.aux)
    for k in o0.aux:
        assert float(jnp.max(jnp.abs(o0.aux[k] - o1.aux[k]))) <= tol, k

    s1 = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(o1.state)
    }
    for p, v in jax.tree_util.tree_leaves_with_path(o0.state):
        ks = jax.tree_util.keystr(p)
        assert float(jnp.max(jnp.abs(v - s1[ks]))) <= tol, ks


def test_fused_heads_single_head_falls_back():
    # with only the rbf trunk live the model must take the unfused path
    # (len(head_list) == 1) regardless of the flag
    cfg = Config(
        aux_tasks={}, fake_detection=False, loss="ae_mse",
        fused_heads=True, dropout=0.0,
    )
    params, state = net.init_net(jax.random.PRNGKey(0), cfg)
    x, _, _, _, key = _toy_batch(cfg)
    out = net.forward(params, state, cfg, x, train=True, key=key)
    assert bool(jnp.all(jnp.isfinite(out.rec)))
