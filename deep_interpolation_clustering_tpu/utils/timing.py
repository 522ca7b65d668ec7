"""Wall-clock timing utilities.

The reference's only profiling facility is a context manager logging the
duration of a block (utils.py:102-116). Here that survives as `timer`, plus a
`block_timer` variant that synchronizes outstanding JAX async dispatch first so
device work is actually included — the honest way to time jitted steps.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from .logging import logger


def _fmt(diff: float) -> str:
    if diff >= 3600:
        return f"{diff / 3600:.2f}h"
    if diff >= 60:
        return f"{diff / 60:.2f}m"
    return f"{diff:.2f}s"


@contextmanager
def timer(message: str):
    tick = time.time()
    yield
    logger.info("%s: %s", message, _fmt(time.time() - tick))


def hard_sync(devices=None) -> None:
    """Force completion of all work queued on each device.

    Per-device execution is FIFO, so fetching the result of a freshly
    enqueued trivial program implies everything queued before it finished.
    The fetch goes through device_get because on tunneled backends
    `block_until_ready` (and `effects_barrier`, which only waits on
    side-effect tokens, not pure computations) can return early.
    """
    import jax
    import jax.numpy as jnp

    for d in devices if devices is not None else jax.devices():
        jax.device_get(jax.device_put(jnp.zeros(()), d) + 1.0)


@contextmanager
def block_timer(message: str, result: dict | None = None):
    """Time a block, hard-syncing all pending device work at entry and exit.

    Pass `result` to capture the elapsed seconds under key 'seconds'.
    """
    hard_sync()
    tick = time.time()
    yield
    hard_sync()
    diff = time.time() - tick
    if result is not None:
        result["seconds"] = diff
    logger.info("%s: %s", message, _fmt(diff))
