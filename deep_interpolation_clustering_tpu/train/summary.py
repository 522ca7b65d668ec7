"""Metric logging: JSONL event stream + optional TensorBoard scalars.

Reproduces the reference's `Summary` wrapper (utils.py:175-186): scalars are
filtered to `METRICS ∪ SUMMARY_ITEMS` and tagged `{scope}_{key}` at a global
step. A machine-readable `events.jsonl` is always written (the primary
record); TensorBoard output rides along when tensorboardX is importable.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

from ..info import METRICS, SUMMARY_ITEMS


class Summary:
    def __init__(
        self,
        log_dir: str,
        metric_items: Sequence[str] = METRICS,
        summary_items: Sequence[str] = SUMMARY_ITEMS,
        use_tensorboard: bool = True,
    ):
        self.metric_items = set(metric_items)
        self.summary_items = set(summary_items)
        # multi-host: only process 0 writes (same shared-filesystem rule as
        # checkpoints); the filter/format logic still runs everywhere so
        # metric handling stays identical across processes
        from ..parallel import is_main_process

        self._jsonl = None
        self._tb = None
        if not is_main_process():
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "events.jsonl"), "a")
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:  # pragma: no cover - tensorboardX optional
                self._tb = None

    def add_summary(self, step: int, **kwargs) -> None:
        scope = kwargs.get("scope", "")
        rec: Dict[str, float] = {}
        for k, v in kwargs.items():
            if k in self.metric_items or k in self.summary_items:
                v = float(np.asarray(v))
                rec[k] = v
                if self._tb is not None:
                    self._tb.add_scalar(f"{scope}_{k}", v, global_step=step)
        if rec and self._jsonl is not None:
            rec.update(step=step, scope=scope)
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()

    def add_embedding(self, features: np.ndarray, step: int, tag: str) -> None:
        """Latent-space projector dump (reference pretrain_trainer.py:117)."""
        if self._tb is not None:
            try:
                self._tb.add_embedding(features, global_step=step, tag=tag)
            except Exception:
                pass

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
