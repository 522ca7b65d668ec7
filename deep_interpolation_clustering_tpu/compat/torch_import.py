"""torch state_dict -> JAX pytree conversion (parity harness).

The north-star parity contract is *same weights in -> same outputs out* at
1e-5 (the reference never seeds torch — utils.py:37-42 — so init-level
reproducibility is undefined even torch-to-torch). This module maps the
reference model's state_dict names onto this framework's param/state
pytrees:

  sci.kernel                               -> params['sci']['kernel']
  cci.kernel                               -> params['cci']['kernel']
  {encoder,decoder}.lstm.weight_ih_l0[_reverse] etc.
                                           -> params[...]['fwd'/'bwd'] (torch
                                              [i|f|g|o] gate packing is kept)
  rbf.kernel                               -> params['rbf']['kernel']
  rbf.compress_fc.module.model.{0,1,4}.*   -> rbf compress trunk
                                              (Linear, BatchNorm1d, Linear;
                                              reference rbf.py:111-125)
  {predict_future,aux_head,fake_det_head}.model.{0,1,3}.*
                                           -> head trunks (pretrain_interp.py:43-87)
  cluster_assignment.cluster_centers       -> params['cluster_centers'] (dec.py:41)

Works on raw numpy-valued dicts, so torch is only needed by the caller.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    # copy=True: tensor.numpy() SHARES memory with the live torch tensor, so
    # an aliasing view here would silently track in-place torch mutations
    # (e.g. optimizer.step()) after the import
    return np.array(v, np.float32, copy=True)


def _lstm(sd: Dict, prefix: str) -> Dict:
    out = {}
    for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
        out[direction] = {
            "w_ih": _np(sd[f"{prefix}.lstm.weight_ih_l0{suffix}"]),
            "w_hh": _np(sd[f"{prefix}.lstm.weight_hh_l0{suffix}"]),
            "b_ih": _np(sd[f"{prefix}.lstm.bias_ih_l0{suffix}"]),
            "b_hh": _np(sd[f"{prefix}.lstm.bias_hh_l0{suffix}"]),
        }
    return out


def _head(sd: Dict, prefix: str, fc2_idx: int) -> Tuple[Dict, Dict]:
    """Sequential(Linear, BatchNorm1d, ..., Linear) -> (params, state)."""
    params = {
        "fc1": {
            "w": _np(sd[f"{prefix}.0.weight"]),
            "b": _np(sd[f"{prefix}.0.bias"]),
        },
        "bn": {
            "gamma": _np(sd[f"{prefix}.1.weight"]),
            "beta": _np(sd[f"{prefix}.1.bias"]),
        },
        "fc2": {
            "w": _np(sd[f"{prefix}.{fc2_idx}.weight"]),
            "b": _np(sd[f"{prefix}.{fc2_idx}.bias"]),
        },
    }
    state = {
        "bn": {
            "mean": _np(sd[f"{prefix}.1.running_mean"]),
            "var": _np(sd[f"{prefix}.1.running_var"]),
        }
    }
    return params, state


def import_torch_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """Convert a reference Net state_dict (pretrain or clustering variant)
    into this framework's (params, state) pytrees."""
    sd = {k: v for k, v in sd.items()}
    params: Dict = {
        "sci": {"kernel": _np(sd["sci.kernel"])},
        "cci": {"kernel": _np(sd["cci.kernel"])},
        "encoder": _lstm(sd, "encoder"),
        "decoder": _lstm(sd, "decoder"),
    }
    state: Dict = {}

    rbf_p, rbf_s = _head(sd, "rbf.compress_fc.module.model", fc2_idx=4)
    rbf_p = {"kernel": _np(sd["rbf.kernel"]), "compress": rbf_p}
    params["rbf"], state["rbf"] = rbf_p, {"compress": rbf_s}

    for torch_name, ours in (
        ("predict_future", "predict_future"),
        ("aux_head", "aux_head"),
        ("fake_det_head", "fake_det_head"),
    ):
        key = f"{torch_name}.model.0.weight"
        if key in sd:
            p, s = _head(sd, f"{torch_name}.model", fc2_idx=3)
            params[ours], state[ours] = p, s

    if "cluster_assignment.cluster_centers" in sd:
        params["cluster_centers"] = _np(sd["cluster_assignment.cluster_centers"])
    return params, state


def export_to_torch_state_dict(params: Dict, state: Dict) -> Dict[str, np.ndarray]:
    """Inverse mapping (numpy values): lets a reference-side consumer load
    weights trained by this framework."""
    sd: Dict[str, np.ndarray] = {
        "sci.kernel": np.asarray(params["sci"]["kernel"]),
        "cci.kernel": np.asarray(params["cci"]["kernel"]),
        "rbf.kernel": np.asarray(params["rbf"]["kernel"]),
    }
    for name in ("encoder", "decoder"):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            d = params[name][direction]
            sd[f"{name}.lstm.weight_ih_l0{suffix}"] = np.asarray(d["w_ih"])
            sd[f"{name}.lstm.weight_hh_l0{suffix}"] = np.asarray(d["w_hh"])
            sd[f"{name}.lstm.bias_ih_l0{suffix}"] = np.asarray(d["b_ih"])
            sd[f"{name}.lstm.bias_hh_l0{suffix}"] = np.asarray(d["b_hh"])

    def head(prefix: str, p: Dict, s: Dict, fc2_idx: int):
        sd[f"{prefix}.0.weight"] = np.asarray(p["fc1"]["w"])
        sd[f"{prefix}.0.bias"] = np.asarray(p["fc1"]["b"])
        sd[f"{prefix}.1.weight"] = np.asarray(p["bn"]["gamma"])
        sd[f"{prefix}.1.bias"] = np.asarray(p["bn"]["beta"])
        sd[f"{prefix}.1.running_mean"] = np.asarray(s["bn"]["mean"])
        sd[f"{prefix}.1.running_var"] = np.asarray(s["bn"]["var"])
        # strict-load completeness: torch BatchNorm1d carries this buffer in
        # its state_dict and the reference restores with strict=True
        # (pretrain_trainer.py:400). It only feeds cumulative averaging
        # (momentum=None), which the reference never uses (default 0.1), so
        # 0 is behavior-identical.
        sd[f"{prefix}.1.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
        sd[f"{prefix}.{fc2_idx}.weight"] = np.asarray(p["fc2"]["w"])
        sd[f"{prefix}.{fc2_idx}.bias"] = np.asarray(p["fc2"]["b"])

    head("rbf.compress_fc.module.model", params["rbf"]["compress"],
         state["rbf"]["compress"], 4)
    for name in ("predict_future", "aux_head", "fake_det_head"):
        if name in params:
            head(f"{name}.model", params[name], state[name], 3)
    if "cluster_centers" in params:
        sd["cluster_assignment.cluster_centers"] = np.asarray(
            params["cluster_centers"]
        )
    return sd
