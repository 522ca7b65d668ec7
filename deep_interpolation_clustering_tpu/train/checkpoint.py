"""Checkpointing: per-metric best-model directories, partial restore.

Reproduces the reference's checkpoint subsystem (utils.py:126-199) on a
self-contained npz format:
  * `weight/{loss,ae_mse,delta}/checkpoint.npz` — a checkpoint is written
    whenever its monitored metric improves (`save_model_update_flag`,
    utils.py:126-138); all monitored metrics here are minimized
    (info.py MIN_METRICS).
  * A checkpoint stores epoch, params, model state (batch-norm statistics),
    and optimizer state — the torch `{epoch, state_dict, optimizer}` triple
    (utils.py:141-145).
  * `FlagDict` tracks best values + improvement epochs; `early_stop` fires
    when `epoch - latest_improvement + 1 > patience` (utils.py:148-159).
  * `partial_restore` merges only matching keys — the p1→p3 transfer that
    loads pretrain weights into the clustering model whose extra DEC head
    stays at init (clustering_trainer.py:431-447).

Format: params/state leaves are stored under slash-joined pytree paths
(`params/encoder/fwd/w_ih`), so partial restores are key-based like a torch
state_dict; the optimizer state is stored by flat leaf index and restored
into a freshly-built template of identical structure.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from ..utils import logger

CKPT_NAME = "checkpoint.npz"


# ------------------------------------------------------------- pytree io
def _flatten_nested(d: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_nested(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_nested(flat: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_checkpoint(
    path: str,
    epoch: int,
    params: Dict,
    state: Dict,
    opt_state: Any = None,
    extra: Optional[Dict] = None,
) -> str:
    """Write one checkpoint file (atomically via rename)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    arrays.update({f"params/{k}": v for k, v in _flatten_nested(jax.device_get(params)).items()})
    arrays.update({f"state/{k}": v for k, v in _flatten_nested(jax.device_get(state)).items()})
    if opt_state is not None:
        leaves = jax.tree_util.tree_leaves(jax.device_get(opt_state))
        for i, leaf in enumerate(leaves):
            arrays[f"opt/{i:05d}"] = np.asarray(leaf)
    meta = {"epoch": int(epoch)}
    if extra:
        meta.update(extra)
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    return path


def load_meta(path: str) -> Dict:
    """Read only the JSON meta blob from a checkpoint (npz entries load
    lazily, so this touches one small array, not the weights)."""
    with np.load(path) as z:
        return json.loads(bytes(z["__meta__"]).decode())


def load_checkpoint(
    path: str, opt_state_template: Any = None
) -> Tuple[int, Dict, Dict, Any, Dict]:
    """Returns (epoch, params, state, opt_state, meta). `opt_state` is None
    unless a structurally-identical template is supplied."""
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrays.pop("__meta__")).decode())
    params_flat = {k[len("params/"):]: v for k, v in arrays.items() if k.startswith("params/")}
    state_flat = {k[len("state/"):]: v for k, v in arrays.items() if k.startswith("state/")}
    params = _unflatten_nested(params_flat)
    state = _unflatten_nested(state_flat)
    opt_state = None
    if opt_state_template is not None:
        opt_keys = sorted(k for k in arrays if k.startswith("opt/"))
        leaves = [arrays[k] for k in opt_keys]
        treedef = jax.tree_util.tree_structure(opt_state_template)
        template_leaves = jax.tree_util.tree_leaves(opt_state_template)
        if not leaves:
            # weights-only checkpoint (e.g. imported from a torch
            # model.pth.tar via dic-convert): no optimizer state was ever
            # saved — expected, not corruption
            logger.info(
                "checkpoint carries no optimizer state (weights-only): "
                "optimizer starts fresh"
            )
            return meta["epoch"], params, state, None, meta
        if len(leaves) != len(template_leaves):
            # layout mismatch: params/state still restore; the optimizer
            # restarts fresh rather than crashing the resume. The logged
            # signature distinguishes the known legacy layout (pre-flat-
            # vector: one moment pair per param leaf, so MORE leaves than
            # the template) from a truncated/corrupted blob (fewer).
            # np.shape reads the .shape attribute only — np.asarray on a
            # device-resident leaf would D2H-transfer megabytes of moment
            # vectors over the tunnel just to log a warning
            sig = lambda ls: "[" + ", ".join(  # noqa: E731
                str(np.shape(l)) for l in ls[:4]
            ) + (", ..." if len(ls) > 4 else "") + "]"
            logger.warning(
                "optimizer state layout mismatch — checkpoint %d leaves %s "
                "vs template %d leaves %s (%s): restoring params only, "
                "optimizer state restarts fresh",
                len(leaves), sig(leaves), len(template_leaves),
                sig(template_leaves),
                "looks like the pre-flat-vector legacy layout"
                if len(leaves) > len(template_leaves)
                else "FEWER leaves than the template — possibly a "
                "truncated or corrupted checkpoint",
            )
            return meta["epoch"], params, state, None, meta
        leaves = [
            np.asarray(l, dtype=np.asarray(t).dtype).reshape(np.asarray(t).shape)
            for l, t in zip(leaves, template_leaves)
        ]
        opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return meta["epoch"], params, state, opt_state, meta


def partial_restore(target: Dict, source: Dict, prefix: str = "") -> Tuple[Dict, list]:
    """Merge `source` leaves into `target` wherever paths match (shape-checked).

    Returns (merged, loaded_paths). Unmatched target keys keep their values —
    the reference's filtered strict=False load (clustering_trainer.py:437-444).
    """
    tgt_flat = _flatten_nested(target)
    src_flat = _flatten_nested(source)
    loaded = []
    for k, v in src_flat.items():
        if k in tgt_flat and tgt_flat[k].shape == v.shape:
            tgt_flat[k] = v.astype(tgt_flat[k].dtype)
            loaded.append(k)
    merged = _unflatten_nested(tgt_flat)
    return merged, loaded


# ------------------------------------------- best-metric flags, early stop
class FlagDict:
    """Best metric values + improvement epochs (utils.py:126-138, 162-172)."""

    def __init__(self, metrics: Sequence[str]):
        self.best = {m: float("inf") for m in metrics}
        self.best_epoch = {m: 0 for m in metrics}

    def improved(self, metric_dict: Dict[str, float], epoch: int) -> list:
        """Record improvements (<= best, as the reference) for monitored
        metrics present in `metric_dict`; returns the improved names."""
        out = []
        for m in self.best:
            if m in metric_dict and metric_dict[m] <= self.best[m]:
                self.best[m] = float(metric_dict[m])
                self.best_epoch[m] = epoch
                out.append(m)
        return out

    def early_stop(self, epoch: int, patience: int) -> bool:
        latest = max(self.best_epoch.values()) if self.best_epoch else 0
        if epoch - latest + 1 > patience:
            logger.info("=== early stop at epoch %d (best %s) ===", epoch, self.best)
            return True
        return False

    def to_dict(self) -> Dict[str, float]:
        d: Dict[str, float] = {}
        for m in self.best:
            d[m] = self.best[m]
            d[m + "_epoch"] = self.best_epoch[m]
        return d

    def state_dict(self) -> Dict:
        """JSON-serializable snapshot for the checkpoint meta blob. The
        reference loses this on resume (utils.py:126-138 re-creates the
        flag dict at inf), so a resumed run's first — typically worse —
        epoch overwrites every best checkpoint; persisting it fixes that.
        Never-improved metrics (still inf) serialize as None: json.dumps
        would emit the non-RFC token `Infinity`, breaking strict JSON
        consumers of the meta blob."""
        return {
            "best": {
                m: (None if v == float("inf") else v) for m, v in self.best.items()
            },
            "best_epoch": dict(self.best_epoch),
        }

    def merge_state(self, d: Dict) -> None:
        """Min-merge a saved snapshot into the live flags. Each checkpoint
        records bests as of ITS save, so merging across every metric dir's
        checkpoint recovers each metric's true best regardless of which
        checkpoint the weights were restored from."""
        best = d.get("best", {})
        best_epoch = d.get("best_epoch", {})
        for m, v in best.items():
            if v is None:  # serialized inf: that metric never improved
                continue
            if m in self.best and float(v) <= self.best[m]:
                self.best[m] = float(v)
                self.best_epoch[m] = int(best_epoch.get(m, self.best_epoch[m]))


def weight_dirs(root: str, metrics: Sequence[str]) -> Dict[str, str]:
    """`weight/{metric}/` best-checkpoint directories (utils.py:195-199)."""
    out = {}
    for m in metrics:
        d = os.path.join(root, m)
        os.makedirs(d, exist_ok=True)
        out[m] = d
    return out
