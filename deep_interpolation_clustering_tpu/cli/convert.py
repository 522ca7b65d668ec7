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
    """`model.pth.tar` -> weights-only `checkpoint.npz`. The torch
    optimizer's group LR rides along in the meta so a later `to_torch`
    (or this framework's LR restore fallback) resumes at the saved rate
    rather than the init default."""
    blob = _load_torch_file(src)
    sd = blob["state_dict"] if isinstance(blob, dict) and "state_dict" in blob else blob
    epoch = int(blob.get("epoch", 0)) if isinstance(blob, dict) else 0
    extra: Dict = {"imported_from": os.path.abspath(src)}
    try:
        extra["lr"] = float(blob["optimizer"]["param_groups"][0]["lr"])
    except (TypeError, KeyError, IndexError):
        pass  # weights-only / exotic blob: no LR to carry
    params, state = import_torch_state_dict(sd)
    ckpt.save_checkpoint(dst, epoch, params, state, opt_state=None, extra=extra)
    logger.info("to_jax: %s (epoch %d) -> %s", src, epoch, dst)
    return dst


def _fresh_torch_opt_state(
    n_params: int, meta: Dict, optimizer: str, weight_decay: float
) -> Dict:
    """A state_dict a freshly constructed reference optimizer load_state_dicts
    cleanly: zero per-param state, one group with every param, hyperparams
    mirroring utils.pytorch_optimizer for the chosen optimizer (torch's
    load_state_dict REPLACES the group's hyperparams with these, so they
    must carry the right keys per optimizer class — an Adam-shaped group
    makes a restored SGD crash on its first step with KeyError 'momentum').
    LR comes from the checkpoint meta when present; weight_decay from the
    CLI (--weight_decay), because the replacement above would silently
    override whatever the resuming run passed on ITS command line. The
    remaining hyperparams are the torch-constructor defaults the reference
    factory uses (utils.py:77-83 sets none of them)."""
    lr = float(meta.get("lr", 3e-3))
    common = {"maximize": False, "foreach": None, "differentiable": False,
              "weight_decay": weight_decay}
    if optimizer == "adam":
        hyper = {"lr": lr, "betas": (0.9, 0.999), "eps": 1e-8,
                 "amsgrad": True, "capturable": False, "fused": None,
                 **common}
    elif optimizer == "sgd":
        hyper = {"lr": lr, "momentum": 0.9, "dampening": 0,
                 "nesterov": True, "fused": None, **common}
    elif optimizer == "rmsprop":
        hyper = {"lr": lr, "momentum": 0.9, "alpha": 0.99, "eps": 1e-8,
                 "centered": False, "capturable": False, **common}
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    return {"state": {},
            "param_groups": [{**hyper, "params": list(range(n_params))}]}


def to_torch(src: str, dst: str, optimizer: str = "adam",
             weight_decay: float = 4e-4) -> str:
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
        "optimizer": _fresh_torch_opt_state(n_params, meta, optimizer,
                                            weight_decay),
    }
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    torch.save(blob, dst)
    logger.info("to_torch: %s (epoch %d) -> %s", src, epoch, dst)
    return dst


def _convert_tree(direction: str, src: str, dst: str, optimizer: str,
                  weight_decay: float) -> int:
    """Weight-root directory mode: convert every `<metric>/` checkpoint."""
    n = 0
    for metric in sorted(os.listdir(src)):
        if direction == "to_jax":
            f = os.path.join(src, metric, TORCH_NAME)
            if os.path.isfile(f):
                to_jax(f, os.path.join(dst, metric, ckpt.CKPT_NAME))
                n += 1
        else:
            f = os.path.join(src, metric, ckpt.CKPT_NAME)
            if os.path.isfile(f):
                to_torch(f, os.path.join(dst, metric, TORCH_NAME),
                         optimizer, weight_decay)
                n += 1
    return n


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("direction", choices=["to_jax", "to_torch"])
    parser.add_argument("--src", required=True,
                        help="checkpoint file or weight root directory")
    parser.add_argument("--dst", required=True,
                        help="output file or weight root directory")
    parser.add_argument("--optimizer", default="adam",
                        choices=["adam", "sgd", "rmsprop"],
                        help="to_torch: optimizer class the reference run "
                             "will restore into (shapes the synthesized "
                             "optimizer state's hyperparameter keys)")
    parser.add_argument("--weight_decay", type=float, default=4e-4,
                        help="to_torch: weight decay written into the "
                             "synthesized optimizer state — torch's "
                             "load_state_dict installs it over the "
                             "resuming run's own flag, so pass the value "
                             "that run will use")
    args = parser.parse_args(argv)
    if os.path.isdir(args.src):
        n = _convert_tree(args.direction, args.src, args.dst,
                          args.optimizer, args.weight_decay)
        if n == 0:
            parser.error(f"no checkpoints found under {args.src}/*/")
    elif args.direction == "to_jax":
        to_jax(args.src, args.dst)
    else:
        to_torch(args.src, args.dst, args.optimizer, args.weight_decay)


if __name__ == "__main__":
    main()
