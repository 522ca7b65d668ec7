"""The shared-weight SCI path (`sci_share_weights`, the default) must be
bit-identical to per-stream SCI — the dedup is pure algebra: SCI's
logit/softmax chain depends only on (mask, ts), never on ob
(reference interpolation_layer.py:59-83)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.models.net import forward, init_net
from deep_interpolation_clustering_tpu.ops.interpolation import (
    Planes,
    sci_forward,
    sci_forward_multi,
)
from deep_interpolation_clustering_tpu.train.steps import build_inputs

B, C, T, R, HOURS = 4, 6, 18, 6, 6


def _planes(rng, shared_mask, shared_ts):
    ob = jnp.asarray(rng.randn(B, C, T).astype(np.float32))
    ae = jnp.asarray((rng.rand(B, C, T) < 0.8).astype(np.float32))
    return Planes(ob, shared_mask, shared_ts, ae)


def test_sci_multi_bitwise_equals_per_stream(rng):
    mask_np = (rng.rand(B, C, T) < 0.6).astype(np.float32)
    mask_np[:, :, 0] = 1.0
    mask = jnp.asarray(mask_np)
    ts = jnp.asarray((HOURS * rng.rand(B, C, T)).astype(np.float32))
    kernel = jnp.asarray(rng.rand(C).astype(np.float32))
    streams = [_planes(rng, mask, ts) for _ in range(3)]

    multi = sci_forward_multi(kernel, streams, R, HOURS)
    for s, got in zip(streams, multi):
        want = sci_forward(kernel, s, R, HOURS)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _batch(rng, cfg):
    t = cfg.num_timestamps
    mask = (rng.rand(B, cfg.num_variables, t) < 0.6).astype(np.float32)
    mask[:, :, 0] = 1.0
    return {
        "ob": jnp.asarray(rng.rand(B, cfg.num_variables, t).astype(np.float32)),
        "padding_mask": jnp.asarray(mask),
        "timestamp": jnp.asarray(
            (HOURS * rng.rand(B, cfg.num_variables, t)).astype(np.float32)
        ),
        "ae_mask": jnp.asarray(
            (rng.rand(B, cfg.num_variables, t) < 0.8).astype(np.float32)
        ),
    }


def _forward_pair(rng, cfg_on, train=True, jit=False):
    """Run the same forward with sci_share_weights on/off; return outputs."""
    cfg_off = dataclasses.replace(cfg_on, sci_share_weights=False)
    key = jax.random.PRNGKey(11)
    params, state = init_net(key, cfg_on)
    inputs = build_inputs(cfg_on, _batch(rng, cfg_on), jax.random.PRNGKey(3),
                          train=train, denoise=False)

    def run(cfg):
        fn = lambda: forward(  # noqa: E731
            params, state, cfg, inputs["x"], fake_x=inputs["fake_x"],
            fake_perm_idx=inputs["fake_perm_idx"],
            positive_x=inputs["positive_x"], train=train,
            key=jax.random.PRNGKey(5),
        )
        return jax.jit(fn)() if jit else fn()

    return run(cfg_on), run(cfg_off)


def _assert_outputs_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a.hidden), np.asarray(b.hidden))
    np.testing.assert_array_equal(np.asarray(a.rec), np.asarray(b.rec))
    for k in a.aux:
        np.testing.assert_array_equal(
            np.asarray(a.aux[k]), np.asarray(b.aux[k]), err_msg=k
        )


def test_forward_dedup_bit_identical(rng):
    cfg = Config(batch_size=B, num_timestamps=T)
    assert cfg.sci_share_weights
    _assert_outputs_equal(*_forward_pair(rng, cfg))


def test_forward_dedup_bit_identical_jit(rng):
    cfg = Config(batch_size=B, num_timestamps=T)
    _assert_outputs_equal(*_forward_pair(rng, cfg, jit=True))


def test_forward_dedup_with_triplet(rng):
    """The triplet positive has augmented (differing) ts — it must fall back
    to its own SCI while real+fake still share; outputs stay bit-identical."""
    cfg = Config(batch_size=B, num_timestamps=T, triple_margin=1.0)
    _assert_outputs_equal(*_forward_pair(rng, cfg))


def test_forward_dedup_augmented_falls_back(rng):
    """With aug_input the real/fake ts are independently jittered: no stream
    shares, both flag settings take the per-stream path — still identical."""
    cfg = Config(batch_size=B, num_timestamps=T, aug_input=True)
    _assert_outputs_equal(*_forward_pair(rng, cfg))
