"""North-star parity: same weights in -> same outputs out vs the torch
reference, at 1e-5 (BASELINE.md). Builds the actual reference model from
/root/reference (read-only import), copies its state_dict into our pytrees,
and compares every output surface on identical inputs.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# the reference's utils.py imports warmup_scheduler, absent here; stub it
sys.modules.setdefault(
    "warmup_scheduler", types.SimpleNamespace(GradualWarmupScheduler=object)
)
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.compat import (
    export_to_torch_state_dict,
    import_torch_state_dict,
)
from deep_interpolation_clustering_tpu.models import forward

B, C, T, R, HOURS = 8, 6, 30, 6, 6


def _args(clustering=False):
    ns = types.SimpleNamespace(
        num_variables=C, num_timestamps=T, ref_points=R, hours_from_admission=HOURS,
        dropout=0.2, fake_detection=True, triple_margin=0.0,
        aux_tasks={"future_vital": 0.5},
        loss="ae_mse_sup_fake_detect", scale=5,
    )
    if clustering:
        ns.cluster_number = 4
        ns.loss = "ae_mse_sup_fake_detect_kl"
    return ns


def _cfg(clustering=False):
    return Config(
        num_variables=C, num_timestamps=T, ref_points=R, hours_from_admission=HOURS,
        cluster_number=4,
    )


def _planes(rng):
    mask = np.zeros((B, C, T), np.float32)
    for i in range(B):
        for j in range(C):
            mask[i, j, : rng.randint(3, T + 1)] = 1.0
    ob = (rng.rand(B, C, T).astype(np.float32) * 5 - 2.5) * mask
    ts = np.sort(rng.rand(B, C, T).astype(np.float32) * HOURS, axis=-1) * mask
    ae = mask * (rng.rand(B, C, T) > 0.2).astype(np.float32)
    return np.concatenate([ob, mask, ts, ae], axis=1)


@pytest.fixture
def inputs(rng):
    x = _planes(rng)
    fake_x = _planes(rng)
    perm = rng.permutation(2 * B)
    return x, fake_x, perm


def _run_torch(net_cls, args, x, fake_x, perm, seed_centers=None):
    model = net_cls(args, torch.device("cpu"))
    if seed_centers is not None:
        model.init_cluster_center(torch.tensor(seed_centers))
    model.eval()
    with torch.no_grad():
        hidden, rec, aux = model(
            torch.tensor(x), torch.tensor(fake_x), torch.tensor(perm), None
        )
    return model, hidden.numpy(), rec.numpy(), {
        k: v.detach().numpy() for k, v in aux.items() if hasattr(v, "detach")
    }


def _run_ours(cfg, sd, x, fake_x, perm, clustering=False):
    params, state = import_torch_state_dict(sd)
    out = forward(params, state, cfg, x, fake_x=fake_x, fake_perm_idx=perm, train=False)
    return params, state, out


def test_pretrain_forward_parity(inputs):
    from pretrain_interp import Net  # reference, read-only

    x, fake_x, perm = inputs
    model, t_hidden, t_rec, t_aux = _run_torch(Net, _args(), x, fake_x, perm)
    _, _, out = _run_ours(_cfg(), model.state_dict(), x, fake_x, perm)

    np.testing.assert_allclose(np.asarray(out.hidden), t_hidden, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.rec), t_rec, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.aux["future_vital"]), t_aux["future_vital"], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.aux["fake_det"]), t_aux["fake_det"], rtol=1e-5, atol=1e-5
    )


def test_clustering_forward_parity(inputs, rng):
    from clustering_interp import Net  # reference, read-only

    x, fake_x, perm = inputs
    centers = rng.randn(4, 256).astype(np.float32)
    model, t_hidden, t_rec, t_aux = _run_torch(
        Net, _args(clustering=True), x, fake_x, perm, seed_centers=centers
    )
    _, _, out = _run_ours(_cfg(True), model.state_dict(), x, fake_x, perm, True)

    np.testing.assert_allclose(np.asarray(out.hidden), t_hidden, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.aux["cluster_pred"]), t_aux["cluster_pred"], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.aux["cluster_label"]), t_aux["cluster_label"], rtol=1e-5, atol=1e-5
    )


def test_loss_parity(inputs):
    """All loss surfaces at identical weights + inputs (pretrain variant)."""
    from pretrain_interp import Net

    x, fake_x, perm = inputs
    args = _args()
    model, t_hidden, t_rec, t_aux = _run_torch(Net, args, x, fake_x, perm)

    rng2 = np.random.RandomState(1)
    ob = x[:, :C]
    mask = x[:, C : 2 * C]
    fv = rng2.rand(B, C).astype(np.float32)
    fvm = (rng2.rand(B, C) < 0.9).astype(np.float32)
    label = np.concatenate([np.ones(B), np.zeros(B)])[perm].astype(np.int64)

    with torch.no_grad():
        t_rec_d = model.rec_loss(torch.tensor(ob), torch.tensor(t_rec), torch.tensor(mask))
        t_aux_d = model.sup_aux_loss(
            args.aux_tasks, {"future_vital": torch.tensor(fv)},
            {k: torch.tensor(v) for k, v in t_aux.items()}, torch.tensor(fvm),
        )
        t_fake_d = model.fake_det_loss(
            torch.tensor(label), torch.tensor(t_aux["fake_det"])
        )

    cfg = _cfg()
    params, state, out = _run_ours(cfg, model.state_dict(), x, fake_x, perm)
    from deep_interpolation_clustering_tpu.models.losses import (
        fake_det_loss,
        rec_loss,
        sup_aux_loss,
    )
    import jax.numpy as jnp

    ours_rec = rec_loss(jnp.asarray(ob), out.rec, jnp.asarray(mask))
    np.testing.assert_allclose(
        float(ours_rec["ae_mse"]), float(t_rec_d["ae_mse"]), rtol=1e-5
    )
    ours_aux = sup_aux_loss(cfg, {"future_vital": jnp.asarray(fv)}, out.aux, jnp.asarray(fvm))
    np.testing.assert_allclose(
        float(ours_aux["future_vital"]), float(t_aux_d["future_vital"]), rtol=1e-5
    )
    ours_fake = fake_det_loss(jnp.asarray(label), out.aux["fake_det"])
    np.testing.assert_allclose(
        float(ours_fake["fake_detection"]), float(t_fake_d["fake_detection"]), rtol=1e-5
    )


def test_export_roundtrip(inputs):
    """export_to_torch_state_dict loads cleanly into the reference model and
    reproduces our outputs — the reverse migration path."""
    from pretrain_interp import Net

    x, fake_x, perm = inputs
    model = Net(_args(), torch.device("cpu"))
    params, state = import_torch_state_dict(model.state_dict())
    sd = export_to_torch_state_dict(params, state)

    model2 = Net(_args(), torch.device("cpu"))
    # strict: the export carries EVERY key the reference model owns
    # (num_batches_tracked included), so the reference's own restore path
    # (pretrain_trainer.py:400, strict=True) accepts it unmodified
    model2.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    model2.eval()
    model.eval()
    with torch.no_grad():
        h1, r1, _ = model(torch.tensor(x), torch.tensor(fake_x), torch.tensor(perm), None)
        h2, r2, _ = model2(torch.tensor(x), torch.tensor(fake_x), torch.tensor(perm), None)
    np.testing.assert_allclose(h1.numpy(), h2.numpy(), atol=1e-6)
    np.testing.assert_allclose(r1.numpy(), r2.numpy(), atol=1e-6)


def test_train_step_parity(inputs):
    """One-step (and 5-step) gradient/optimizer parity vs torch: identical
    weights + batch, torch `loss.backward()` -> `clip_grad_norm_` ->
    Adam(amsgrad, coupled L2).step() (reference pretrain_trainer.py:227-229,
    utils.py:77-83) must produce the same updated params at 1e-5.

    Dropout is 0 so the forwards are deterministic; BN runs in train mode
    (batch stats) on both sides. grad_clip is set to half the measured
    first-step gradient norm so the clipping branch is actually exercised.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from deep_interpolation_clustering_tpu.models.losses import compute_losses
    from deep_interpolation_clustering_tpu.train.optim import make_optimizer
    from pretrain_interp import Net

    x, fake_x, perm = inputs
    args = _args()
    args.dropout = 0.0
    args.unsup_aux_tasks = {"fake_detection": 1, "triplet": 1, "kl": 10}
    args.aux_pos_weights = {}
    torch.manual_seed(0)  # deterministic init (the reference never seeds torch)
    model = Net(args, torch.device("cpu"))
    model.train()

    rng2 = np.random.RandomState(1)
    ob = x[:, :C]
    mask = x[:, C : 2 * C]
    fv = rng2.rand(B, C).astype(np.float32)
    fvm = (rng2.rand(B, C) < 0.9).astype(np.float32)
    label = np.concatenate([np.ones(B), np.zeros(B)])[perm].astype(np.int64)

    def torch_loss():
        hidden, rec_ob, aux_pred = model(
            torch.tensor(x), torch.tensor(fake_x), torch.tensor(perm), None
        )
        rec_d = model.rec_loss(
            torch.tensor(ob * mask), rec_ob, torch.tensor(mask)
        )
        aux_d = model.sup_aux_loss(
            args.aux_tasks, {"future_vital": torch.tensor(fv)}, aux_pred,
            torch.tensor(fvm),
        )
        fake_d = model.fake_det_loss(torch.tensor(label), aux_pred["fake_det"])
        tasks = dict(args.aux_tasks)
        tasks.update(args.unsup_aux_tasks)
        task_losses = dict(aux_d)
        task_losses.update(fake_d)
        return model.multi_task_loss(tasks, rec_d, task_losses)["loss"]

    lr, wd, n_steps = 3e-3, 4e-4, 5
    t_opt = torch.optim.Adam(
        model.parameters(), lr=lr, weight_decay=wd, amsgrad=True
    )

    cfg = _cfg().replace(
        dropout=0.0, init_lr=lr, weight_decay_rate=wd,
        loss="ae_mse_sup_fake_detect",
    )
    params, state = import_torch_state_dict(model.state_dict())

    def loss_fn(params, state):
        out = forward(
            params, state, cfg, x, fake_x=fake_x, fake_perm_idx=perm,
            train=True, key=jax.random.PRNGKey(0),
        )
        losses = compute_losses(
            cfg, jnp.asarray(ob * mask), jnp.asarray(mask), out,
            {"future_vital": jnp.asarray(fv)}, jnp.asarray(fvm),
            jnp.asarray(label), None, None,
        )
        return losses["loss"], out.state

    grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))

    # pick a clip that BITES: half the measured first-step grad norm
    # (measured functionally on our side, so neither side's BN buffers move)
    g0, _ = grad_fn(params, state)
    clip = float(optax.global_norm(g0)) / 2.0
    optimizer = make_optimizer(cfg.replace(grad_clip=clip))
    opt_state = optimizer.init(params)

    def assert_params_close(tag, state_atol=1e-5):
        """1e-5 parity, modulo Adam's eps-scale denominators: for elements
        with |g| ~ eps=1e-8, the t=1 update is lr * g/(|g|+eps) whose
        sensitivity to float32 gradient noise is lr*eps/(|g|+eps)^2 — up to
        ~1e6x — so a handful of near-zero-grad elements legitimately land
        1e-5..5e-4 apart. Allow <=0.01% such elements, each bounded by 1e-3
        (a REAL divergence — wrong gate order, misapplied weight decay,
        wrong amsgrad max — moves many elements by >1e-2 and trips the
        counter). Measured: ~19 of 648k elements beyond 1e-5 after step 1."""
        t_params, t_state = import_torch_state_dict(model.state_dict())
        flat_t = dict(jax.tree_util.tree_leaves_with_path(t_params))
        flat_ours = jax.tree_util.tree_leaves_with_path(jax.device_get(params))
        assert len(flat_t) == len(flat_ours)
        n_viol = n_tot = 0
        for path, leaf in flat_ours:
            ours, theirs = np.asarray(leaf), np.asarray(flat_t[path])
            diff = np.abs(ours - theirs)
            tol = 1e-5 + 1e-5 * np.abs(theirs)
            assert diff.max() < 1e-3, (
                f"param mismatch {tag} at {path}: max {diff.max():.2e}"
            )
            n_viol += int((diff > tol).sum())
            n_tot += diff.size
        assert n_viol <= max(1, n_tot // 10_000), (
            f"{tag}: {n_viol}/{n_tot} elements beyond 1e-5"
        )
        flat_ts = dict(jax.tree_util.tree_leaves_with_path(t_state))
        for path, leaf in jax.tree_util.tree_leaves_with_path(jax.device_get(state)):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_ts[path]), rtol=1e-5,
                atol=state_atol, err_msg=f"state mismatch {tag} at {path}",
            )

    for step in range(n_steps):
        # torch step
        model.zero_grad()
        torch_loss().backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
        t_opt.step()
        # our step
        grads, state = grad_fn(params, state)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if step == 0:
            assert_params_close("after 1 step")
    # BN running stats integrate the (bounded) param drift across steps
    assert_params_close(f"after {n_steps} steps", state_atol=1e-4)


def test_triplet_branch_parity(inputs, rng):
    """Triplet branch parity at the reference's scale=20 config
    (clustering_interp.py:174-183, 234-236): same weights + identical
    positive/fake inputs -> same positive/negative latents and triplet loss."""
    from clustering_interp import Net

    x, fake_x, perm = inputs
    args = _args(clustering=True)
    args.triple_margin = 1.0
    args.scale = 20
    model = Net(args, torch.device("cpu"))
    model.init_cluster_center(torch.tensor(rng.randn(4, 256).astype(np.float32)))
    model.eval()

    pos_x = _planes(np.random.RandomState(5))
    with torch.no_grad():
        t_hidden, _, t_aux = model(
            torch.tensor(x), torch.tensor(fake_x), torch.tensor(perm),
            torch.tensor(pos_x),
        )
        t_trip = model.triplet_loss(
            t_hidden, t_aux["positive"], t_aux["negative"], args.triple_margin
        )

    cfg = _cfg(True).replace(triple_margin=1.0, scale=20)
    params, state = import_torch_state_dict(model.state_dict())
    out = forward(
        params, state, cfg, x, fake_x=fake_x, fake_perm_idx=perm,
        positive_x=pos_x, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out.aux["positive"]), t_aux["positive"].numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.aux["negative"]), t_aux["negative"].numpy(),
        rtol=1e-5, atol=1e-5,
    )
    from deep_interpolation_clustering_tpu.models.losses import triplet_loss

    ours = triplet_loss(
        out.hidden, out.aux["positive"], out.aux["negative"], 1.0
    )
    np.testing.assert_allclose(
        float(ours["triplet"]), float(t_trip["triplet"]), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("variant", [
    # (c, t, r, hours, scale): sweep the geometry/scaling space the fixed
    # harness above never leaves (C=6, T=30, R=6, scale=5)
    dict(c=6, t=17, r=4, hours=12.0, scale=0),
    dict(c=3, t=45, r=8, hours=6.0, scale=5),
    dict(c=6, t=64, r=6, hours=24.0, scale=2),
    dict(c=2, t=9, r=3, hours=6.0, scale=5),
])
def test_forward_parity_config_fuzz(rng, variant):
    """Parity must hold across the CONFIG SPACE, not just the defaults:
    same weights -> same outputs at 1e-5 for varied channel counts,
    sequence lengths, RBF reference points, admission windows, and input
    scaling (scale=0 disables the affine entirely — a distinct code path
    on both sides)."""
    from pretrain_interp import Net  # reference, read-only

    c, t, r, hours, scale = (variant[k] for k in ("c", "t", "r", "hours", "scale"))
    args = _args()
    args.num_variables, args.num_timestamps, args.ref_points = c, t, r
    args.hours_from_admission, args.scale = hours, scale
    cfg = Config(num_variables=c, num_timestamps=t, ref_points=r,
                 hours_from_admission=hours, scale=scale)

    def planes():
        mask = np.zeros((B, c, t), np.float32)
        for i in range(B):
            for j in range(c):
                mask[i, j, : rng.randint(2, t + 1)] = 1.0
        amp = scale if scale else 1.0
        ob = (rng.rand(B, c, t).astype(np.float32) * amp - amp / 2) * mask
        ts = np.sort(rng.rand(B, c, t).astype(np.float32) * hours, -1) * mask
        ae = mask * (rng.rand(B, c, t) > 0.2).astype(np.float32)
        return np.concatenate([ob, mask, ts, ae], axis=1)

    x, fake_x = planes(), planes()
    perm = rng.permutation(2 * B)
    model, t_hidden, t_rec, t_aux = _run_torch(Net, args, x, fake_x, perm)
    _, _, out = _run_ours(cfg, model.state_dict(), x, fake_x, perm)

    np.testing.assert_allclose(np.asarray(out.hidden), t_hidden,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.rec), t_rec, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.aux["future_vital"]),
                               t_aux["future_vital"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.aux["fake_det"]),
                               t_aux["fake_det"], rtol=1e-5, atol=1e-5)
