"""The interpolation-prediction autoencoder network.

One functional model covers both pipeline stages — the reference duplicates
its whole module tree between `pretrain_interp.py` and `clustering_interp.py`
(pretrain_interp.py:14-215 ≡ clustering_interp.py:14-247); here the DEC head
is just an optional `cluster_centers` leaf in the param pytree.

Architecture (reference pretrain_interp.py:90-167):
  SCI -> CCI -> biLSTM encoder  -> latent = concat(fwd/bwd final hidden)
                biLSTM decoder (ReLU'd encoder outputs, seeded with enc state)
             -> RBF decode back onto irregular observed timestamps
  + FuturePredFc (sigmoid 6-d future-vital regression)
  + AuxFc (binary outcome logits) when extra aux tasks are configured
  + FakeDetFc (log-softmax real/fake) over the permuted concat of real and
    fake latents
  + optional DEC Student-t soft assignment / target distribution
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops import nn
from ..ops.dec import centers_init, soft_assignment, target_distribution
from ..ops.interpolation import (
    Planes,
    cci_forward,
    cci_identity_kernel,
    sci_forward,
    sci_forward_multi,
    to_planes,
)
from ..ops.lstm import bilstm_forward, lstm_init
from ..ops.rbf import rbf_init, rbf_push

Array = jax.Array


class NetOutput(NamedTuple):
    hidden: Array  # (B, 2H) latent
    rec: Array  # (B, C, T) reconstruction at observed timestamps
    aux: Dict[str, Array]  # head predictions keyed by task
    state: Dict  # updated batch-norm state


def init_net(
    key: Array, cfg: Config, clustering: bool = False, dtype=jnp.float32
) -> Tuple[Dict, Dict]:
    """Build the param/state pytrees. `clustering=True` adds the DEC head."""
    c = cfg.num_variables
    h = cfg.lstm_hidden
    latent = cfg.dim_enc_hidden
    ks = jax.random.split(key, 8)

    params: Dict = {
        # per-channel temporal kernel ~ U[0,1) (reference interpolation_layer.py:23)
        "sci": {"kernel": jax.random.uniform(ks[0], (c,), dtype)},
        "cci": {"kernel": cci_identity_kernel(c, dtype)},
        "encoder": lstm_init(ks[1], 3 * c, h, dtype),
        "decoder": lstm_init(ks[2], 2 * h, h, dtype),
    }
    state: Dict = {}

    rbf_p, rbf_s = rbf_init(ks[3], latent, c, cfg.head_hidden, dtype)
    params["rbf"], state["rbf"] = rbf_p, rbf_s

    num_aux = len(cfg.aux_tasks)
    if "future_vital" in cfg.aux_tasks:
        p, s = nn.head_init(ks[4], latent, cfg.head_hidden, c, dtype)
        params["predict_future"], state["predict_future"] = p, s
        num_aux -= 1
    if num_aux > 0:
        p, s = nn.head_init(ks[5], latent, cfg.head_hidden, num_aux, dtype)
        params["aux_head"], state["aux_head"] = p, s
    if cfg.fake_detection:
        p, s = nn.head_init(ks[6], latent, cfg.head_hidden, 2, dtype)
        params["fake_det_head"], state["fake_det_head"] = p, s
    if clustering:
        params["cluster_centers"] = centers_init(
            ks[7], cfg.cluster_number, latent, dtype
        )
    return params, state


def _sci(params: Dict, cfg: Config, x: Array) -> Array:
    """SingleChannelInterp on one (B, 4C, T) stream -> (B, R, 3C)."""
    if cfg.use_pallas:
        from ..ops.pallas_interp import sci_forward_pallas as sci_fn
    elif cfg.use_pallas_bwd:
        from ..ops.pallas_interp import sci_forward_hybrid as sci_fn
    else:
        sci_fn = sci_forward
    return sci_fn(
        params["sci"]["kernel"], x, cfg.ref_points, cfg.hours_from_admission
    )


def _sci_streams(params: Dict, cfg: Config, streams) -> list:
    """SCI over every stream, computing the ob-independent weight tensors
    ONCE for streams that share (mask, ts) (`sci_forward_multi`).

    Sharing is proven by Python object identity on the mask/ts leaves at
    trace time — `build_inputs` reuses the same arrays for the real and
    fake streams whenever augmentation is off (steps.py: `fake_ts =
    ts_raw`), so the dedup is structural, adds no data-dependent control
    flow under jit, and falls back to per-stream SCI whenever identity
    can't be shown (augmented ts, stacked external inputs, Pallas paths).
    Bit-identical either way; measured A/B in PARITY.md r5.
    """
    use_multi = (
        cfg.sci_share_weights and not cfg.use_pallas and not cfg.use_pallas_bwd
    )
    planes = [to_planes(s, cfg.num_variables) for s in streams]
    groups: list = []  # indices into `streams`, grouped by shared (mask, ts)
    for i, p in enumerate(planes):
        if use_multi:
            for g in groups:
                q = planes[g[0]]
                if p.mask is q.mask and p.ts is q.ts:
                    g.append(i)
                    break
            else:
                groups.append([i])
        else:
            groups.append([i])
    reps: list = [None] * len(streams)
    for g in groups:
        if len(g) == 1:
            reps[g[0]] = _sci(params, cfg, planes[g[0]])
        else:
            outs = sci_forward_multi(
                params["sci"]["kernel"], [planes[i] for i in g],
                cfg.ref_points, cfg.hours_from_admission,
            )
            for i, r in zip(g, outs):
                reps[i] = r
    return reps


def _encode_rep(
    params: Dict, cfg: Config, rep: Array
) -> Tuple[Array, Array, Array, Array]:
    """CCI -> encoder over an SCI rep. Returns (enc_out, hidden, cell,
    cat_hidden)."""
    rep = cci_forward(params["cci"]["kernel"], rep)
    rep = jnp.transpose(rep, (1, 0, 2))  # time-major (R, B, 3C)
    enc_out, hidden, cell = bilstm_forward(
        params["encoder"], rep, use_pallas=cfg.use_pallas_lstm
    )
    cat_hidden = jnp.concatenate([hidden[0], hidden[1]], axis=-1)
    return enc_out, hidden, cell, cat_hidden


def _encode(params: Dict, cfg: Config, x: Array) -> Tuple[Array, Array, Array, Array]:
    """SCI -> CCI -> encoder. Returns (enc_out, hidden, cell, cat_hidden)."""
    return _encode_rep(params, cfg, _sci(params, cfg, x))


def forward(
    params: Dict,
    state: Dict,
    cfg: Config,
    x: Array,
    fake_x: Optional[Array] = None,
    fake_perm_idx: Optional[Array] = None,
    positive_x: Optional[Array] = None,
    train: bool = False,
    key: Optional[Array] = None,
    sample_mask: Optional[Array] = None,
) -> NetOutput:
    """Full forward pass (reference pretrain_interp.py:130-167,
    clustering_interp.py:134-189).

    Train steps run under `cfg.matmul_precision` ("high" = bf16_3x, the
    measured throughput/parity sweet spot); eval/dump forwards run under
    `cfg.eval_matmul_precision` ("highest" = full f32) — eval is a tiny
    share of wall (one fused epoch per eval boundary; dumps once per run)
    and "highest" puts every user-facing latent and the machine-checked
    on-chip parity surface at ~5.1e-5 vs torch instead of ~1.1e-4
    (PARITY.md r4 ledger; the 1e-5 contract itself is checked on the f32
    CPU backend, where both knobs are no-ops).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    prec = cfg.matmul_precision if train else cfg.eval_matmul_precision
    with jax.default_matmul_precision(prec):
        return _forward_impl(
            params, state, cfg, x, fake_x, fake_perm_idx, positive_x,
            train, key, sample_mask,
        )


def _forward_impl(
    params: Dict,
    state: Dict,
    cfg: Config,
    x: Array,
    fake_x: Optional[Array],
    fake_perm_idx: Optional[Array],
    positive_x: Optional[Array],
    train: bool,
    key: Array,
    sample_mask: Optional[Array],
) -> NetOutput:
    k_rbf, k_future, k_aux, k_fake = jax.random.split(key, 4)
    new_state = dict(state)

    # Run real / fake / triplet-positive streams through ONE batched encode:
    # every encode op is per-sample (no batch coupling), so results are
    # bit-identical to the reference's three sequential passes
    # (pretrain_interp.py:130-166) while the latency-bound R-step LSTM chain
    # executes once instead of three times.
    b = (x.ob if isinstance(x, Planes) else x).shape[0]
    streams = [x]
    use_fake = (
        cfg.fake_detection and fake_x is not None and fake_perm_idx is not None
    )
    use_triplet = use_fake and cfg.triple_margin != 0.0 and positive_x is not None
    if use_fake:
        streams.append(fake_x)
    if use_triplet:
        streams.append(positive_x)
    if len(streams) > 1:
        # SCI runs per stream and only the tiny (B, R, 3C) reps concatenate:
        # concatenating the (B, 4C, T) planes instead costs two ~20 us
        # 17 MB concats plus their backward slices per step (trace r3);
        # every SCI op is per-sample so the results are bit-identical
        enc_out_all, hidden_all, cell_all, cat_all = _encode_rep(
            params, cfg,
            jnp.concatenate(_sci_streams(params, cfg, streams), axis=0),
        )
        enc_out = enc_out_all[:, :b]
        hidden = hidden_all[:, :b]
        cell = cell_all[:, :b]
        cat_hidden = cat_all[:b]
        fake_cat_hidden = cat_all[b : 2 * b] if use_fake else None
        pos_cat_hidden = cat_all[2 * b :] if use_triplet else None
    else:
        enc_out, hidden, cell, cat_hidden = _encode(params, cfg, x)
        fake_cat_hidden = pos_cat_hidden = None

    dec_in = jax.nn.relu(enc_out)  # DecoderRNN ReLUs its input (:39)
    dec_out, _, _ = bilstm_forward(
        params["decoder"], dec_in, hidden, cell, use_pallas=cfg.use_pallas_lstm
    )
    interp_data = jnp.transpose(dec_out, (1, 0, 2))  # (B, R, 2H)

    pos_neg = None
    if use_fake:
        pos_neg = jnp.concatenate([cat_hidden, fake_cat_hidden], axis=0)
        pos_neg = pos_neg[fake_perm_idx]

    aux: Dict[str, Array] = {}
    b_sz, r, in_dim = interp_data.shape
    # train-mode BN row masks for padded-tail batches: each head's moments
    # must see only the REAL rows (the reference's short-batch BN semantics
    # — a short batch normalizes over its own rows, pretrain_trainer.py
    # trains the tail with no drop_last). None when the batch is unpadded.
    masked = train and sample_mask is not None
    rbf_mask = jnp.repeat(sample_mask, r) if masked else None
    row_mask = sample_mask if masked else None
    fake_mask = None
    if masked and use_fake:
        fake_mask = jnp.concatenate([sample_mask, sample_mask])[fake_perm_idx]
    head_list = [("rbf", interp_data.reshape(b_sz * r, in_dim), True, k_rbf,
                  rbf_mask)]
    if "predict_future" in params:
        head_list.append(("predict_future", cat_hidden, False, k_future,
                          row_mask))
    if "aux_head" in params:
        head_list.append(("aux_head", cat_hidden, False, k_aux, row_mask))
    if use_fake:
        head_list.append(("fake_det_head", pos_neg, False, k_fake, fake_mask))

    if cfg.fused_heads and len(head_list) > 1:
        # one batched trunk for every head — the post-encode tail is
        # op-count-bound, not FLOP-bound (benchmarks/profile_step.py)
        ys, new_sts = nn.heads_apply_fused(
            [{
                "params": params[n] if n != "rbf" else params["rbf"]["compress"],
                "state": state[n] if n != "rbf" else state["rbf"]["compress"],
                "x": xh, "relu": relu, "row_mask": mh,
            } for n, xh, relu, _, mh in head_list],
            cfg.dropout, train, k_rbf,
        )
        head_out = {n: y for (n, *_), y in zip(head_list, ys)}
        for (n, *_), st in zip(head_list, new_sts):
            if n == "rbf":
                new_state["rbf"] = {"compress": st}
            else:
                new_state[n] = st
    else:
        head_out = {}
        for n, xh, relu, kh, mh in head_list:
            p = params[n] if n != "rbf" else params["rbf"]["compress"]
            s = state[n] if n != "rbf" else state["rbf"]["compress"]
            y, st = nn.head_apply(
                p, s, xh, cfg.dropout, train, kh, relu=relu, row_mask=mh
            )
            head_out[n] = y
            if n == "rbf":
                new_state["rbf"] = {"compress": st}
            else:
                new_state[n] = st

    proj = head_out["rbf"].reshape(b_sz, r, cfg.num_variables)
    proj = jnp.transpose(proj, (0, 2, 1))  # (B, C, R)
    rec = rbf_push(
        params["rbf"]["kernel"], proj, x, cfg.ref_points,
        cfg.hours_from_admission, cfg.rbf_basis, use_pallas=cfg.use_pallas,
    )

    if "predict_future" in params:
        aux["future_vital"] = jax.nn.sigmoid(head_out["predict_future"])
    if "aux_head" in params:
        y = head_out["aux_head"]
        for i, task in enumerate(t for t in cfg.aux_tasks if t != "future_vital"):
            aux[task] = y[:, i]
    if use_fake:
        aux["fake_det"] = jax.nn.log_softmax(head_out["fake_det_head"], axis=1)
        if use_triplet:
            aux["positive"] = pos_cat_hidden
            aux["negative"] = fake_cat_hidden

    if "cluster_centers" in params:
        q = soft_assignment(params["cluster_centers"], cat_hidden, cfg.dec_alpha)
        aux["cluster_pred"] = q
        # .detach() in the reference (clustering_interp.py:186)
        aux["cluster_label"] = jax.lax.stop_gradient(
            target_distribution(q, sample_mask)
        )

    return NetOutput(cat_hidden, rec, aux, new_state)
