"""Jitted train / eval steps.

The reference's per-batch host work — fake-sample generation in DataLoader
workers (dataloader.py:182-193), label shuffling via `torch.randperm`
(pretrain_trainer.py:160-165), Gaussian augmentation (dataloader.py:196-217)
— all moves *inside* the compiled step as functions of `(batch, key)`: zero
host↔device traffic beyond the batch itself, and every step reproducible
from its PRNG key.

Under a data mesh the batch is sharded on axis 0 and parameters are
replicated; XLA turns the loss/gradient reductions into `psum`s over ICI,
and the batch-norm / fake-permutation / target-distribution batch reductions
stay *global-batch* semantics exactly like the reference's single process
(SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..data.loader import augment_batch, make_fake_ob
from ..models import forward
from ..models.losses import compute_losses
from ..ops.interpolation import Planes

Array = jax.Array


def build_inputs(
    cfg: Config, batch: Dict[str, Array], key: Array, train: bool, denoise: bool
) -> Dict[str, Any]:
    """Assemble the stacked model inputs from a batch dict.

    Mirrors the reference's per-batch assembly (pretrain_trainer.py:130-185):
    `ob` is re-masked, optionally denoised (`ob * ae_mask` as model input
    while the loss target stays the full `ob`), the fake batch is generated
    and its labels permuted, and the optional triplet positive is a
    Gaussian-jittered copy.
    """
    # the 6-way split predates augment_batch handling the positive pair's
    # two sub-keys itself; the last key is unused but kept so every other
    # stream (and the fused-vs-stepped bit-identity goldens) is unchanged
    k_aug, k_fake, k_fake_aug, k_perm, k_pos, _ = jax.random.split(key, 6)
    ob_raw = batch["ob"]
    padding_mask = batch["padding_mask"]
    ts_raw = batch["timestamp"]
    ae_mask = batch["ae_mask"]

    # the reference generates fakes from the RAW ob, then augments the real
    # and fake streams independently (dataloader.py:133, 147-148, 196-217)
    ob, timestamp = ob_raw, ts_raw
    if train and cfg.aug_input:
        ob, timestamp = augment_batch(
            ob_raw, ts_raw, padding_mask, k_aug, cfg.aug_std,
            draw_bits=cfg.rng_draw_bits,
        )

    ob = ob * padding_mask

    def stack(o, t):
        # Planes, not a stacked (B, 4C, T) tensor: the stack was two ~9 MB
        # concats per step whose only consumers (SCI/RBF) re-slice them
        # (trace r3, ~38 us/step at B=256); values are identical
        o_in = o * ae_mask if denoise else o
        return Planes(o_in, padding_mask, t, ae_mask)

    x = stack(ob, timestamp)
    out: Dict[str, Any] = {
        "x": x,
        "ob": ob,
        "padding_mask": padding_mask,
        "fake_x": None,
        "fake_perm_idx": None,
        "fake_det_label": None,
        "fake_row_mask": None,
        "positive_x": None,
    }

    sample_mask = batch.get("sample_mask")
    out["sample_mask"] = sample_mask

    if cfg.fake_detection:
        fake_ob = make_fake_ob(
            ob_raw, padding_mask, k_fake, cfg.scale,
            draw_bits=cfg.rng_draw_bits,
        )
        fake_ts = ts_raw
        if train and cfg.aug_input:
            fake_ob, fake_ts = augment_batch(
                fake_ob, ts_raw, padding_mask, k_fake_aug, cfg.aug_std,
                draw_bits=cfg.rng_draw_bits,
            )
        out["fake_x"] = stack(fake_ob * padding_mask, fake_ts)
        b = ob.shape[0]
        label = jnp.concatenate([jnp.ones((b,)), jnp.zeros((b,))])
        perm = jax.random.permutation(k_perm, 2 * b)
        out["fake_perm_idx"] = perm
        out["fake_det_label"] = label[perm].astype(jnp.int32)
        if sample_mask is not None:
            row_mask = jnp.concatenate([sample_mask, sample_mask])
            out["fake_row_mask"] = row_mask[perm]

    if cfg.triple_margin != 0.0 and cfg.fake_detection:
        pos_ob, pos_ts = augment_batch(
            ob, timestamp, padding_mask, k_pos, cfg.triple_pos_std,
            draw_bits=cfg.rng_draw_bits,
        )
        # the reference never denoises the positive branch
        # (pretrain_trainer.py:171-173) — parity requires the raw jittered ob
        out["positive_x"] = Planes(pos_ob, padding_mask, pos_ts, ae_mask)

    # supervised aux labels ride along untouched
    out["aux_label"] = {t: batch[t] for t in cfg.aux_tasks if t in batch}
    out["future_vital_mask"] = batch.get("future_vital_mask")
    return out


def _forward_and_losses(
    params: Dict,
    state: Dict,
    cfg: Config,
    inputs: Dict[str, Any],
    train: bool,
    key: Array,
):
    net_out = forward(
        params,
        state,
        cfg,
        inputs["x"],
        fake_x=inputs["fake_x"],
        fake_perm_idx=inputs["fake_perm_idx"],
        positive_x=inputs["positive_x"],
        train=train,
        key=key,
        sample_mask=inputs["sample_mask"],
    )
    losses = compute_losses(
        cfg,
        inputs["ob"],
        inputs["padding_mask"],
        net_out,
        inputs["aux_label"],
        inputs["future_vital_mask"],
        inputs["fake_det_label"],
        inputs["sample_mask"],
        inputs["fake_row_mask"],
    )
    return net_out, losses


def gather_batch(data: Dict[str, Array], idx: Array) -> Dict[str, Array]:
    """On-device batch assembly from an HBM-resident cohort: one `take`
    per plane instead of a host->device transfer per batch. With a data
    mesh, `data` is replicated and `idx` batch-sharded, so each shard
    gathers only its rows."""
    return {k: jnp.take(v, idx, axis=0) for k, v in data.items()}


def slice_block(data3: Dict[str, Array], k) -> Dict[str, Array]:
    """Batch k of a block-layout cohort (`parallel/cohort.ShardedCohort`):
    one `dynamic_index` on the UNSHARDED block axis per plane — shard-local,
    zero collectives (each device slices its own `(nb, B/D, ...)` block).
    The storage is pre-permuted into epoch order, so block k IS the batch
    the replicated path's `gather_batch` would assemble."""
    return {
        name: jax.lax.dynamic_index_in_dim(v, k, 0, keepdims=False)
        for name, v in data3.items()
    }


def _compute_cast(cfg: Config, params, batch):
    """Opt-in mixed precision: float params/batch enter the forward in
    `cfg.compute_dtype` (e.g. bfloat16 for MXU throughput); the cast is
    differentiated, so gradients and the optimizer state stay float32.
    The parity path keeps the default float32 (SURVEY.md §7 hard-part 1)."""
    if cfg.compute_dtype == "float32":
        return params, batch
    dtype = jnp.dtype(cfg.compute_dtype)

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, params), jax.tree_util.tree_map(cast, batch)


def _make_update(cfg: Config, optimizer: optax.GradientTransformation, denoise: bool):
    """The (unjitted) forward + losses + grads + clip + optimizer body
    shared by the per-batch step and the fused-epoch scan."""

    def loss_fn(params, state, batch, key):
        params, batch = _compute_cast(cfg, params, batch)
        k_in, k_drop = jax.random.split(key)
        inputs = build_inputs(cfg, batch, k_in, train=True, denoise=denoise)
        net_out, losses = _forward_and_losses(params, state, cfg, inputs, True, k_drop)
        losses = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), losses)
        state_out = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), net_out.state
        )
        return losses["loss"], (state_out, losses)

    def update(params, state, opt_state, batch, key):
        grads, (new_state, losses) = jax.grad(loss_fn, has_aux=True)(
            params, state, batch, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, losses

    return update


def make_train_step(
    cfg: Config,
    optimizer: optax.GradientTransformation,
    denoise: bool,
    gather: bool = False,
    masked: bool = False,
):
    """Returns a jitted train step with donated carries.

    `gather=False`: `(params, state, opt_state, batch, key)` with the batch
    streamed from host. `gather=True`: `(params, state, opt_state, data,
    idx, key)` with the cohort resident on device and the batch gathered
    by index inside the step.

    `masked=True` (gather only): the step additionally takes a
    `(B,) sample_mask` after `idx` — the padded-tail train step. The tail
    indices are padded to the full batch shape by REPEATING real rows
    (finite values everywhere, so no NaN leaks into gradients through the
    masked-out logsumexp paths), and the mask excludes the padding from
    every loss reduction AND from the BatchNorm batch moments — exactly
    the reference's short-batch semantics (it trains the tail with no
    drop_last, pretrain_trainer.py:127-130), but shape-stable and
    mesh-divisible so sharded runs train every encounter too.
    """
    update = _make_update(cfg, optimizer, denoise)

    if not gather:
        if masked:
            # no caller builds this today (the streamed-batch path pads the
            # batch itself); fail loudly rather than hand back a 5-arg
            # unmasked step to someone expecting the 7-arg masked contract
            raise NotImplementedError(
                "masked=True requires gather=True (device-resident cohort); "
                "the streamed-batch path carries sample_mask in the batch"
            )
        return jax.jit(update, donate_argnums=(0, 1, 2))

    if masked:
        def train_step_masked(params, state, opt_state, data, idx, sample_mask,
                              key):
            batch = gather_batch(data, idx)
            batch["sample_mask"] = sample_mask
            return update(params, state, opt_state, batch, key)

        return jax.jit(train_step_masked, donate_argnums=(0, 1, 2))

    def train_step_gather(params, state, opt_state, data, idx, key):
        return update(params, state, opt_state, gather_batch(data, idx), key)

    return jax.jit(train_step_gather, donate_argnums=(0, 1, 2))


def make_train_step_blocks(
    cfg: Config,
    optimizer: optax.GradientTransformation,
    denoise: bool,
    masked: bool = False,
):
    """Block-layout mirror of `make_train_step(gather=True)`: the batch is
    `slice_block(data3, k)` instead of a gather by index. `masked=True` adds
    a `(B,) sample_mask` after `k` — the padded-tail step (same contract as
    the gather variant's, steps above)."""
    update = _make_update(cfg, optimizer, denoise)

    if masked:
        def step_masked(params, state, opt_state, data3, k, sample_mask, key):
            batch = slice_block(data3, k)
            batch["sample_mask"] = sample_mask
            return update(params, state, opt_state, batch, key)

        return jax.jit(step_masked, donate_argnums=(0, 1, 2))

    def step(params, state, opt_state, data3, k, key):
        return update(params, state, opt_state, slice_block(data3, k), key)

    return jax.jit(step, donate_argnums=(0, 1, 2))


def batch_keys(epoch_key: Array, n: int, start: int = 1) -> Array:
    """The per-batch keys `fold_in(epoch_key, i)` for i = start..start+n-1 —
    identical to the unfused loop's sequence, so fused and step-at-a-time
    epochs are bit-identical."""
    return jax.vmap(lambda i: jax.random.fold_in(epoch_key, i))(
        jnp.arange(start, start + n)
    )


def make_train_epoch(
    cfg: Config, optimizer: optax.GradientTransformation, denoise: bool
):
    """A WHOLE epoch as one compiled program: `lax.scan` of the train step
    over an `(n_batches, B)` index matrix into the HBM-resident cohort.

    One dispatch per epoch instead of one per batch — on a tunneled or
    congested host the per-call latency (~5-10 ms) otherwise dominates the
    ~1 ms step. Returns per-batch loss arrays so the per-batch metric
    record (reference pretrain_trainer.py:231-236) survives, just logged
    after the fact.
    """

    update = _make_update(cfg, optimizer, denoise)

    def epoch_fn(params, state, opt_state, data, idx_mat, epoch_key):
        keys = batch_keys(epoch_key, idx_mat.shape[0])

        def body(carry, inp):
            params, state, opt_state = carry
            idx, key = inp
            params, state, opt_state, losses = update(
                params, state, opt_state, gather_batch(data, idx), key
            )
            return (params, state, opt_state), losses

        (params, state, opt_state), losses = jax.lax.scan(
            body, (params, state, opt_state), (idx_mat, keys),
            unroll=cfg.epoch_scan_unroll,
        )
        return params, state, opt_state, losses

    return jax.jit(epoch_fn, donate_argnums=(0, 1, 2))


def make_train_epoch_blocks(
    cfg: Config, optimizer: optax.GradientTransformation, denoise: bool
):
    """Block-layout mirror of `make_train_epoch`: scans block numbers `ks`
    (the full batches, in storage == epoch order) instead of an index
    matrix. Batch-RNG keys are the same `fold_in(epoch_key, i)` sequence,
    so a block epoch is numerically identical to the replicated fused epoch
    over the same shuffle."""
    update = _make_update(cfg, optimizer, denoise)

    def epoch_fn(params, state, opt_state, data3, ks, epoch_key):
        keys = batch_keys(epoch_key, ks.shape[0])

        def body(carry, inp):
            params, state, opt_state = carry
            k, key = inp
            params, state, opt_state, losses = update(
                params, state, opt_state, slice_block(data3, k), key
            )
            return (params, state, opt_state), losses

        (params, state, opt_state), losses = jax.lax.scan(
            body, (params, state, opt_state), (ks, keys),
            unroll=cfg.epoch_scan_unroll,
        )
        return params, state, opt_state, losses

    return jax.jit(epoch_fn, donate_argnums=(0, 1, 2))


def _make_eval_body(cfg: Config, denoise: bool, dump_keys=None):
    """The shared eval body: forward + losses + per-sample output dict.
    `dump_keys` (static) drops unwanted outputs BEFORE a fused scan stacks
    them — otherwise every plane of the whole cohort materializes in HBM."""

    def eval_step(params, state, batch, key):
        inputs = build_inputs(cfg, batch, key, train=False, denoise=denoise)
        net_out, losses = _forward_and_losses(params, state, cfg, inputs, False, key)
        outputs = {"hidden": net_out.hidden, "rec_ob": net_out.rec}
        for k, v in net_out.aux.items():
            # rows of the fake-det / triplet branches are (2B)- or
            # latent-shaped internals; per-sample dumps keep B-leading keys
            if k in ("fake_det", "positive", "negative"):
                continue
            outputs[k] = v
        if dump_keys is not None:
            outputs = {k: v for k, v in outputs.items() if k in dump_keys}
        return losses, outputs

    return eval_step


def make_eval_epoch(cfg: Config, denoise: bool, dump_keys=None):
    """Fused eval epoch: scan over `(n_batches, B)` padded index rows +
    `(n_batches, B)` sample masks; outputs stack on device so the host does
    ONE bulk fetch for the whole cohort."""

    eval_step = _make_eval_body(cfg, denoise, dump_keys)

    def epoch_fn(params, state, data, idx_mat, mask_mat, epoch_key):
        keys = batch_keys(epoch_key, idx_mat.shape[0])

        def body(_, inp):
            idx, mask, key = inp
            batch = gather_batch(data, idx)
            batch["sample_mask"] = mask
            return None, eval_step(params, state, batch, key)

        _, (losses, outputs) = jax.lax.scan(
            body, None, (idx_mat, mask_mat, keys), unroll=cfg.epoch_scan_unroll
        )
        return losses, outputs

    return jax.jit(epoch_fn)


def make_eval_epoch_blocks(cfg: Config, denoise: bool, dump_keys=None):
    """Block-layout mirror of `make_eval_epoch`: storage sits in identity
    (eval) order, so block k is the k-th sequential padded batch; the mask
    matrix marks real rows exactly as the replicated fused eval's."""
    eval_step = _make_eval_body(cfg, denoise, dump_keys)

    def epoch_fn(params, state, data3, mask_mat, epoch_key):
        nb = mask_mat.shape[0]
        keys = batch_keys(epoch_key, nb)

        def body(_, inp):
            k, mask, key = inp
            batch = slice_block(data3, k)
            batch["sample_mask"] = mask
            return None, eval_step(params, state, batch, key)

        _, (losses, outputs) = jax.lax.scan(
            body, None, (jnp.arange(nb), mask_mat, keys),
            unroll=cfg.epoch_scan_unroll,
        )
        return losses, outputs

    return jax.jit(epoch_fn)


def make_eval_step(
    cfg: Config, denoise: bool, gather: bool = False, dump_keys=None
):
    """Returns jitted `(params, state, batch, key) -> (metrics, outputs)`
    (or `(params, state, data, idx, sample_mask, key)` when `gather=True`,
    with the cohort HBM-resident and shape-padding handled via the
    sample mask).

    `outputs` carries the per-sample dumps the reference collects in
    `eval_one_epoch` (pretrain_trainer.py:346-353): the latent `hidden`,
    `rec_ob`, and the aux-head predictions (including `cluster_pred` /
    `cluster_label` in the DEC stage, which downstream p4 'dl' labeling
    consumes — the reference's loader drops these by mistake,
    p4_clustering_final.py:54).
    """

    eval_step = _make_eval_body(cfg, denoise, dump_keys)

    if not gather:
        return jax.jit(eval_step)

    def eval_step_gather(params, state, data, idx, sample_mask, key):
        batch = gather_batch(data, idx)
        batch["sample_mask"] = sample_mask
        return eval_step(params, state, batch, key)

    return jax.jit(eval_step_gather)


def make_eval_step_blocks(cfg: Config, denoise: bool, dump_keys=None):
    """Block-layout mirror of `make_eval_step(gather=True)`."""
    eval_step = _make_eval_body(cfg, denoise, dump_keys)

    def step(params, state, data3, k, sample_mask, key):
        batch = slice_block(data3, k)
        batch["sample_mask"] = sample_mask
        return eval_step(params, state, batch, key)

    return jax.jit(step)
