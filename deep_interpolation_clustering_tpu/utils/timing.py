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


@contextmanager
def block_timer(message: str, result: dict | None = None):
    """Time a block, blocking on all pending device work at exit.

    Pass `result` to capture the elapsed seconds under key 'seconds'.
    """
    import jax

    jax.block_until_ready(jax.numpy.zeros(()))
    tick = time.time()
    yield
    jax.effects_barrier()
    diff = time.time() - tick
    if result is not None:
        result["seconds"] = diff
    logger.info("%s: %s", message, _fmt(diff))
