"""Checkpoint converter: reference `model.pth.tar` <-> framework `.npz`.

Closes the migration loop in both directions (MIGRATION.md):

  * `to_jax`: a torch checkpoint the reference saved
    (utils.py:141-145 — `{'epoch', 'state_dict', 'optimizer'}`) becomes a
    weights-only `checkpoint.npz` this framework's `--restore` loads
    (the optimizer starts fresh; moments don't cross frameworks).
  * `to_torch`: a `checkpoint.npz` becomes a `model.pth.tar` the UNMODIFIED
    reference restores end-to-end (pretrain_trainer.py:395-404): strict
    `load_state_dict` (BatchNorm `num_batches_tracked` included) AND
    `optimizer.load_state_dict` on a synthesized fresh Adam/SGD/RMSprop
    state (correct group/param counts; the reference restore calls it
    unconditionally, so it must be present and loadable).

`--src`/`--dst` may be single checkpoint files or weight ROOT directories
(`.../weight` with one `<metric>/` subdir per tracked metric — the layout
both sides share); directory mode converts every metric's checkpoint.

torch is imported lazily: only this CLI needs it, not the framework.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np

from ..compat import export_to_torch_state_dict, import_torch_state_dict
from ..train import checkpoint as ckpt
from ..utils import logger

TORCH_NAME = "model.pth.tar"


def _load_torch_file(path: str):
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # older torch saves (or exotic pickled content) predate the
        # weights_only loader; these files are the user's own checkpoints
        return torch.load(path, map_location="cpu", weights_only=False)


def to_jax(src: str, dst: str) -> str:
    """`model.pth.tar` -> weights-only `checkpoint.npz`."""
    blob = _load_torch_file(src)
    sd = blob["state_dict"] if isinstance(blob, dict) and "state_dict" in blob else blob
    epoch = int(blob.get("epoch", 0)) if isinstance(blob, dict) else 0
    params, state = import_torch_state_dict(sd)
    ckpt.save_checkpoint(
        dst, epoch, params, state, opt_state=None,
        extra={"imported_from": os.path.abspath(src)},
    )
    logger.info("to_jax: %s (epoch %d) -> %s", src, epoch, dst)
    return dst


def _fresh_torch_opt_state(n_params: int, meta: Dict) -> Dict:
    """A state_dict a freshly constructed reference optimizer load_state_dicts
    cleanly: zero per-param state, one group with every param, hyperparams
    mirroring utils.pytorch_optimizer's Adam defaults (lr from the
    checkpoint meta when present)."""
    return {
        "state": {},
        "param_groups": [{
            "lr": float(meta.get("lr", 3e-3)),
            "betas": (0.9, 0.999),
            "eps": 1e-8,
            "weight_decay": 4e-4,
            "amsgrad": True,
            "maximize": False,
            "foreach": None,
            "capturable": False,
            "differentiable": False,
            "fused": None,
            "params": list(range(n_params)),
        }],
    }


def to_torch(src: str, dst: str) -> str:
    """`checkpoint.npz` -> `model.pth.tar` (reference-restorable)."""
    import torch

    epoch, params, state, _, meta = ckpt.load_checkpoint(src)
    sd_np = export_to_torch_state_dict(params, state)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}
    n_params = sum(1 for k in sd if not k.endswith(("running_mean", "running_var",
                                                    "num_batches_tracked")))
    blob = {
        "epoch": int(epoch),
        "state_dict": sd,
        "optimizer": _fresh_torch_opt_state(n_params, meta),
    }
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    torch.save(blob, dst)
    logger.info("to_torch: %s (epoch %d) -> %s", src, epoch, dst)
    return dst


def _convert_tree(direction: str, src: str, dst: str) -> int:
    """Weight-root directory mode: convert every `<metric>/` checkpoint."""
    src_name, dst_name, fn = (
        (TORCH_NAME, ckpt.CKPT_NAME, to_jax) if direction == "to_jax"
        else (ckpt.CKPT_NAME, TORCH_NAME, to_torch)
    )
    n = 0
    for metric in sorted(os.listdir(src)):
        f = os.path.join(src, metric, src_name)
        if os.path.isfile(f):
            fn(f, os.path.join(dst, metric, dst_name))
            n += 1
    if n == 0:
        logger.error("no %s found under %s/*/", src_name, src)
    return n


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("direction", choices=["to_jax", "to_torch"])
    parser.add_argument("--src", required=True,
                        help="checkpoint file or weight root directory")
    parser.add_argument("--dst", required=True,
                        help="output file or weight root directory")
    args = parser.parse_args(argv)
    if os.path.isdir(args.src):
        _convert_tree(args.direction, args.src, args.dst)
    else:
        (to_jax if args.direction == "to_jax" else to_torch)(args.src, args.dst)


if __name__ == "__main__":
    main()
