"""dic-convert: the checkpoint bridge to/from the torch reference.

to_jax: a `model.pth.tar` the reference saved (utils.py:141-145) becomes a
weights-only npz whose restored forward matches the torch model at 1e-5.
to_torch: our npz becomes a tar the UNMODIFIED reference restore consumes
end-to-end (pretrain_trainer.py:395-404): strict load_state_dict AND
optimizer.load_state_dict, followed by a working optimizer step.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.modules.setdefault(
    "warmup_scheduler", types.SimpleNamespace(GradualWarmupScheduler=object)
)
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.cli.convert import main as convert_main
from deep_interpolation_clustering_tpu.models import forward
from deep_interpolation_clustering_tpu.train import checkpoint as ckpt

B, C, T, R, HOURS = 8, 6, 30, 6, 6


def _args():
    return types.SimpleNamespace(
        num_variables=C, num_timestamps=T, ref_points=R,
        hours_from_admission=HOURS, dropout=0.2, fake_detection=True,
        triple_margin=0.0, aux_tasks={"future_vital": 0.5},
        loss="ae_mse_sup_fake_detect", scale=5,
    )


def _cfg():
    return Config(num_variables=C, num_timestamps=T, ref_points=R,
                  hours_from_admission=HOURS)


def _planes(rng):
    mask = np.zeros((B, C, T), np.float32)
    for i in range(B):
        for j in range(C):
            mask[i, j, : rng.randint(3, T + 1)] = 1.0
    ob = (rng.rand(B, C, T).astype(np.float32) * 5 - 2.5) * mask
    ts = np.sort(rng.rand(B, C, T).astype(np.float32) * HOURS, axis=-1) * mask
    ae = mask * (rng.rand(B, C, T) > 0.2).astype(np.float32)
    return np.concatenate([ob, mask, ts, ae], axis=1)


def _save_reference_tar(model, path, epoch=7, lr=3e-3):
    """Write the tar exactly the way the reference does (utils.py:141-145)."""
    import torch.optim as optim

    opt = optim.Adam(model.parameters(), lr=lr, weight_decay=4e-4, amsgrad=True)
    state = {"epoch": epoch, "state_dict": model.state_dict(),
             "optimizer": opt.state_dict()}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save(state, path)


def test_to_jax_forward_parity(tmp_path, rng):
    from pretrain_interp import Net  # reference, read-only

    model = Net(_args(), torch.device("cpu"))
    tar = str(tmp_path / "weight" / "ae_mse" / "model.pth.tar")
    _save_reference_tar(model, tar, epoch=7, lr=2e-4)

    npz = str(tmp_path / "out" / "checkpoint.npz")
    convert_main(["to_jax", "--src", tar, "--dst", npz])

    epoch, params, state, opt_state, meta = ckpt.load_checkpoint(npz)
    assert epoch == 7 and opt_state is None
    assert meta["imported_from"].endswith("model.pth.tar")
    # the torch optimizer's LR rides along so resumes (either side)
    # continue at the saved rate, not the init default
    assert meta["lr"] == pytest.approx(2e-4)

    x, fake_x = _planes(rng), _planes(rng)
    perm = rng.permutation(2 * B)
    model.eval()
    with torch.no_grad():
        t_hidden, t_rec, _ = model(
            torch.tensor(x), torch.tensor(fake_x), torch.tensor(perm), None
        )
    out = forward(params, state, _cfg(), x, fake_x=fake_x,
                  fake_perm_idx=perm, train=False)
    np.testing.assert_allclose(np.asarray(out.hidden), t_hidden.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.rec), t_rec.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_to_torch_reference_restores(tmp_path, rng):
    """Replay the reference's restore lines verbatim on our converted tar."""
    from pretrain_interp import Net
    from utils import pytorch_optimizer  # reference, read-only

    src_model = Net(_args(), torch.device("cpu"))
    params_np = {k: v.detach().numpy() for k, v in src_model.state_dict().items()}
    from deep_interpolation_clustering_tpu.compat import import_torch_state_dict

    params, state = import_torch_state_dict(params_np)
    npz = str(tmp_path / "weight" / "loss" / "checkpoint.npz")
    ckpt.save_checkpoint(npz, 11, params, state, extra={"lr": 6e-4})

    tar = str(tmp_path / "torch" / "loss" / "model.pth.tar")
    convert_main(["to_torch", "--src", npz, "--dst", tar])

    # pretrain_trainer.py:398-401, unmodified
    checkpoint = torch.load(tar, weights_only=False)
    model = Net(_args(), torch.device("cpu"))
    assert checkpoint["epoch"] == 11
    model.load_state_dict(checkpoint["state_dict"])  # strict
    optimizer = pytorch_optimizer(model, "Adam", 3e-3, 4e-4)
    optimizer.load_state_dict(checkpoint["optimizer"])
    assert optimizer.param_groups[0]["lr"] == pytest.approx(6e-4)

    # the restored weights match the source model exactly
    for k, v in model.state_dict().items():
        if not k.endswith("num_batches_tracked"):
            np.testing.assert_array_equal(v.numpy(), params_np[k])

    # and the restored pair trains: one step moves the params
    x, fake_x = _planes(rng), _planes(rng)
    perm = torch.tensor(rng.permutation(2 * B))
    hidden, rec, aux = model(torch.tensor(x), torch.tensor(fake_x), perm, None)
    loss = rec.square().mean() + aux["fake_det"].square().mean()
    loss.backward()
    before = model.sci.kernel.detach().clone()
    optimizer.step()
    assert not torch.equal(before, model.sci.kernel)


@pytest.mark.parametrize("opt_name,torch_name", [("sgd", "SGD"),
                                                 ("rmsprop", "RMSprop")])
def test_to_torch_non_adam_optimizers(tmp_path, rng, opt_name, torch_name):
    """--optimizer sgd/rmsprop: the synthesized state carries that class's
    hyperparameter keys, so the reference restore's load_state_dict AND the
    first optimizer.step() work (an Adam-shaped group loads silently, then
    crashes SGD with KeyError 'momentum' on step)."""
    from pretrain_interp import Net
    from utils import pytorch_optimizer  # reference, read-only

    src_model = Net(_args(), torch.device("cpu"))
    from deep_interpolation_clustering_tpu.compat import import_torch_state_dict

    params, state = import_torch_state_dict(
        {k: v.detach().numpy() for k, v in src_model.state_dict().items()}
    )
    npz = str(tmp_path / "checkpoint.npz")
    ckpt.save_checkpoint(npz, 2, params, state)
    tar = str(tmp_path / "model.pth.tar")
    convert_main(["to_torch", "--src", npz, "--dst", tar,
                  "--optimizer", opt_name])

    checkpoint = torch.load(tar, weights_only=False)
    model = Net(_args(), torch.device("cpu"))
    model.load_state_dict(checkpoint["state_dict"])
    optimizer = pytorch_optimizer(model, torch_name, 3e-3, 4e-4)
    optimizer.load_state_dict(checkpoint["optimizer"])
    x, fake_x = _planes(rng), _planes(rng)
    _, rec, _ = model(torch.tensor(x), torch.tensor(fake_x),
                      torch.tensor(rng.permutation(2 * B)), None)
    rec.square().mean().backward()
    optimizer.step()  # the KeyError repro point


def test_directory_mode_roundtrip(tmp_path):
    from pretrain_interp import Net

    root = tmp_path / "ref_weight"
    for metric, epoch in (("loss", 3), ("ae_mse", 5)):
        _save_reference_tar(
            Net(_args(), torch.device("cpu")),
            str(root / metric / "model.pth.tar"), epoch=epoch,
        )
    out = tmp_path / "jax_weight"
    convert_main(["to_jax", "--src", str(root), "--dst", str(out)])
    assert ckpt.load_meta(str(out / "loss" / "checkpoint.npz"))["epoch"] == 3
    assert ckpt.load_meta(str(out / "ae_mse" / "checkpoint.npz"))["epoch"] == 5

    back = tmp_path / "torch_again"
    convert_main(["to_torch", "--src", str(out), "--dst", str(back)])
    for metric in ("loss", "ae_mse"):
        blob = torch.load(str(back / metric / "model.pth.tar"), weights_only=False)
        assert set(blob) == {"epoch", "state_dict", "optimizer"}
