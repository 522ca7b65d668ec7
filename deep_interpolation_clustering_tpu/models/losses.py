"""Loss functions and the loss-mode dispatch table.

Numerics mirror the reference's loss methods (pretrain_interp.py:169-215,
clustering_interp.py:197-247); the 9-way elif chains of the trainers
(pretrain_trainer.py:197-221, clustering_trainer.py:228-272) become a single
component-set dispatch driven by `Config.loss_components`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import Config

Array = jax.Array


def rec_loss(
    org_ob: Array,
    rec_ob: Array,
    padding_mask: Array,
    sample_mask: Optional[Array] = None,
) -> Dict[str, Array]:
    """Masked sum-MSE over observed points / #observed (reference :169-175).

    `where` (not multiply) so the NaN/-inf garbage a shape-padded all-zero-mask
    row produces through the interpolation logsumexp never reaches the sum.
    `sample_mask` additionally excludes shape-padding rows — under on-device
    gather those are real rows duplicated, with real padding masks."""
    if sample_mask is not None:
        padding_mask = padding_mask * sample_mask[:, None, None]
    diff = jnp.where(padding_mask == 1.0, rec_ob - org_ob, 0.0)
    num = jnp.sum(padding_mask == 1.0)
    mse = jnp.sum(jnp.square(diff)) / num
    return {"loss": mse, "ae_mse": mse}


def _masked_mean(x: Array, mask: Optional[Array]) -> Array:
    """Mean over valid rows; identical to `jnp.mean` when `mask` is None.

    The mask marks real rows of a shape-padded batch (parallel.pad_batch_to)
    so padding never perturbs the metrics — for an unpadded batch this is
    exactly the reference's plain means.
    """
    if mask is None:
        return jnp.mean(x)
    return jnp.sum(jnp.where(mask > 0, x, 0.0)) / jnp.sum(mask)


def bce_with_logits(
    logits: Array, targets: Array, pos_weight: float, sample_mask: Optional[Array] = None
) -> Array:
    """torch F.binary_cross_entropy_with_logits with pos_weight, mean reduced:
    l = -[pw * y * log sigmoid(x) + (1-y) * log(1 - sigmoid(x))]."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    return _masked_mean(loss, sample_mask)


def sup_aux_loss(
    cfg: Config,
    aux_label: Dict[str, Array],
    aux_pred: Dict[str, Array],
    future_vital_mask: Optional[Array],
    sample_mask: Optional[Array] = None,
) -> Dict[str, Array]:
    """Masked MSE for future-vital regression + weighted BCE for binary
    outcome tasks (reference :177-196)."""
    out: Dict[str, Array] = {}
    if "future_vital" in cfg.aux_tasks:
        fv_mask = future_vital_mask
        if sample_mask is not None:
            fv_mask = fv_mask * sample_mask[:, None]
        diff = jnp.where(
            fv_mask == 1.0, aux_pred["future_vital"] - aux_label["future_vital"], 0.0
        )
        num = jnp.sum(fv_mask == 1.0)
        out["future_vital"] = jnp.sum(jnp.square(diff)) / num
    for task in cfg.aux_tasks:
        if task == "future_vital":
            continue
        out[task] = bce_with_logits(
            aux_pred[task], aux_label[task], cfg.aux_pos_weights[task], sample_mask
        )
    return out


def fake_det_loss(
    label: Array, log_probs: Array, row_mask: Optional[Array] = None
) -> Dict[str, Array]:
    """NLL over log-softmax outputs, mean reduced (reference :198-200).
    `row_mask` marks real rows of the permuted real+fake concat."""
    picked = jnp.take_along_axis(log_probs, label[:, None].astype(jnp.int32), axis=1)
    return {"fake_detection": -_masked_mean(picked[:, 0], row_mask)}


def kl_loss(
    label: Array, pred: Array, sample_mask: Optional[Array] = None
) -> Dict[str, Array]:
    """Batch-mean KL(p || q) — torch F.kl_div(pred.log(), label,
    reduction='batchmean') (reference clustering_interp.py:205-207)."""
    pointwise = jax.scipy.special.xlogy(label, label) - label * jnp.log(pred)
    per_row = jnp.sum(pointwise, axis=1)
    if sample_mask is None:
        return {"kl": jnp.sum(per_row) / label.shape[0]}
    per_row = jnp.where(sample_mask > 0, per_row, 0.0)
    return {"kl": jnp.sum(per_row) / jnp.sum(sample_mask)}


def triplet_loss(
    anchor: Array,
    positive: Array,
    negative: Array,
    margin: float,
    sample_mask: Optional[Array] = None,
) -> Dict[str, Array]:
    """torch F.triplet_margin_loss: mean(relu(d(a,p) - d(a,n) + margin)),
    d = L2 with torch's eps=1e-6 added to the difference
    (reference clustering_interp.py:234-236)."""
    eps = 1e-6

    def dist(a, b):
        return jnp.sqrt(jnp.sum(jnp.square(a - b + eps), axis=-1))

    losses = jax.nn.relu(dist(anchor, positive) - dist(anchor, negative) + margin)
    return {"triplet": _masked_mean(losses, sample_mask)}


def multi_task_loss(
    task_weights: Dict[str, float],
    rec_loss_dict: Dict[str, Array],
    aux_loss_dict: Dict[str, Array],
) -> Dict[str, Array]:
    """loss = ae_mse + sum_i w_i * loss_i (reference :206-215)."""
    loss = rec_loss_dict["ae_mse"]
    for name, value in aux_loss_dict.items():
        loss = loss + task_weights[name] * value
    out = dict(rec_loss_dict)
    out["loss"] = loss
    out.update(aux_loss_dict)
    return out


def compute_losses(
    cfg: Config,
    ob: Array,
    padding_mask: Array,
    net_out,
    aux_label: Dict[str, Array],
    future_vital_mask: Optional[Array],
    fake_det_label: Optional[Array],
    sample_mask: Optional[Array] = None,
    fake_row_mask: Optional[Array] = None,
) -> Dict[str, Array]:
    """Dispatch on `cfg.loss_components` — the data-driven replacement for
    the reference's loss-name elif chains."""
    comps = cfg.loss_components
    rec = rec_loss(ob, net_out.rec, padding_mask, sample_mask)
    if not comps:
        return rec

    task_weights: Dict[str, float] = {}
    task_losses: Dict[str, Array] = {}
    if "sup" in comps:
        task_weights.update(cfg.aux_tasks)
        task_losses.update(
            sup_aux_loss(cfg, aux_label, net_out.aux, future_vital_mask, sample_mask)
        )
    if "fake" in comps:
        task_weights.update(cfg.unsup_aux_tasks)
        task_losses.update(
            fake_det_loss(fake_det_label, net_out.aux["fake_det"], fake_row_mask)
        )
    if "triplet" in comps:
        task_weights.update(cfg.unsup_aux_tasks)
        task_losses.update(
            triplet_loss(
                net_out.hidden,
                net_out.aux["positive"],
                net_out.aux["negative"],
                cfg.triple_margin,
                sample_mask,
            )
        )
    if "kl" in comps:
        task_weights.update(cfg.unsup_aux_tasks)
        task_losses.update(
            kl_loss(
                net_out.aux["cluster_label"], net_out.aux["cluster_pred"], sample_mask
            )
        )
    return multi_task_loss(task_weights, rec, task_losses)
