"""Test harness: force an 8-virtual-device CPU platform so multi-chip
sharding paths run everywhere (the TPU-idiomatic replacement for fake
backends — see SURVEY.md §4).

The environment's sitecustomize imports jax and registers the TPU backend at
interpreter start, so env vars alone are too late here; backends initialize
lazily, so `jax.config` updates still take effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(7529)
