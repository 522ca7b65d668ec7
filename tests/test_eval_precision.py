"""Routing of the train/eval matmul-precision split (config.py
matmul_precision vs eval_matmul_precision): train forwards must run under
`cfg.matmul_precision`, eval forwards under `cfg.eval_matmul_precision` —
so "highest" eval parity costs zero train throughput. The precision knobs
are no-ops on the CPU test backend, so the routing (not the numerics) is
what a portable test can pin; the numeric claim is machine-checked on the
real chip by bench.py's onchip parity gates."""

import jax
import jax.numpy as jnp
import numpy as np

import deep_interpolation_clustering_tpu.models.net as net_mod
from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.models.net import forward, init_net
from deep_interpolation_clustering_tpu.ops.interpolation import Planes

B, C, T = 4, 6, 12


def _inputs(rng, cfg):
    mask = (rng.rand(B, C, T) < 0.7).astype(np.float32)
    mask[:, :, 0] = 1.0
    return Planes(
        jnp.asarray(rng.rand(B, C, T).astype(np.float32) * mask),
        jnp.asarray(mask),
        jnp.asarray((6 * rng.rand(B, C, T)).astype(np.float32)),
        jnp.asarray((rng.rand(B, C, T) < 0.8).astype(np.float32)),
    )


def test_forward_precision_routing(rng, monkeypatch):
    cfg = Config(
        batch_size=B, num_timestamps=T, fake_detection=False, aux_tasks={},
        matmul_precision="high", eval_matmul_precision="highest",
    )
    params, state = init_net(jax.random.PRNGKey(0), cfg)
    x = _inputs(rng, cfg)

    seen = []
    real_ctx = jax.default_matmul_precision

    def spy(prec):
        seen.append(prec)
        return real_ctx(prec)

    monkeypatch.setattr(net_mod.jax, "default_matmul_precision", spy)
    forward(params, state, cfg, x, train=False)
    forward(params, state, cfg, x, train=True, key=jax.random.PRNGKey(1))
    assert seen == ["highest", "high"]


def test_eval_precision_equal_knobs_match_pre_split(rng):
    """eval_matmul_precision == matmul_precision restores the one-knob
    behavior: eval output identical to a config that predates the split
    (same single precision both paths)."""
    base = dict(batch_size=B, num_timestamps=T, fake_detection=False,
                aux_tasks={})
    cfg_a = Config(**base, matmul_precision="high",
                   eval_matmul_precision="high")
    cfg_b = Config(**base, matmul_precision="high",
                   eval_matmul_precision="highest")
    params, state = init_net(jax.random.PRNGKey(0), cfg_a)
    x = _inputs(rng, cfg_a)
    out_a = forward(params, state, cfg_a, x, train=False)
    out_b = forward(params, state, cfg_b, x, train=False)
    # CPU backend: both precisions are f32, so this doubles as a
    # no-accidental-change guard on the split itself
    np.testing.assert_array_equal(np.asarray(out_a.hidden),
                                  np.asarray(out_b.hidden))
