"""Seeding.

Unlike the reference — which seeds numpy/random/tf but never torch
(utils.py:37-42), making its own training non-reproducible — every source of
randomness here flows from explicit `jax.random` keys derived from one seed,
so a run is reproducible end to end.
"""

from __future__ import annotations

import random

import jax
import numpy as np

from .logging import logger


def set_seed(seed: int) -> jax.Array:
    """Seed host-side RNGs and return the root JAX PRNG key."""
    logger.info("The global seed: %s", seed)
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)
