"""Profiling: XLA trace capture + per-step timing statistics.

The reference's entire profiling surface is one wall-clock context manager
(utils.py:102-116). TPU-native training needs real tools: `trace` wraps a
block in a `jax.profiler` capture viewable in TensorBoard/Perfetto (device
timelines, HLO ops, memory), `annotate` names a region inside a trace, and
`StepTimer` accumulates honest (dispatch-synchronized) per-step latencies
with percentile summaries.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, List, Optional

import numpy as np

from .logging import logger


@contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block.

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates per-step wall-clock latencies, synchronizing device work
    so the numbers mean what they say. Use sparingly (each stop blocks the
    pipeline); intended for profiling runs, not production epochs."""

    def __init__(self, name: str = "step"):
        self.name = name
        self.samples: List[float] = []
        self._tick: Optional[float] = None

    def start(self):
        from .timing import hard_sync

        hard_sync()
        self._tick = time.perf_counter()

    def stop(self, result=None):
        import jax

        from .timing import hard_sync

        if result is not None:
            # fetch one leaf: device_get is the only reliable sync on
            # tunneled backends (block_until_ready can return early)
            leaves = jax.tree_util.tree_leaves(result)
            if leaves:
                jax.device_get(leaves[0])
            jax.block_until_ready(result)
        else:
            hard_sync()
        assert self._tick is not None, "stop() without start()"
        self.samples.append(time.perf_counter() - self._tick)
        self._tick = None

    @contextmanager
    def measure(self):
        self.start()
        yield
        self.stop()

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        a = np.asarray(self.samples) * 1e3
        out = {
            "count": len(a),
            "mean_ms": float(a.mean()),
            "p50_ms": float(np.percentile(a, 50)),
            "p90_ms": float(np.percentile(a, 90)),
            "p99_ms": float(np.percentile(a, 99)),
            "max_ms": float(a.max()),
        }
        logger.info("%s timing: %s", self.name, {k: round(v, 3) for k, v in out.items()})
        return out


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device live-buffer statistics (bytes), where the backend
    exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use", 0),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
                    "bytes_limit": s.get("bytes_limit", 0),
                }
        except Exception:
            continue
    return out
