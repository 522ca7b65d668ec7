"""Generate the committed on-chip parity fixture (tests/fixtures/onchip_parity.npz).

The 1e-5 parity contract (BASELINE.md north star) is *same weights in ->
same outputs out* vs the torch reference. The CPU test suite machine-checks
it every run, but the REAL-TPU number (matmul_precision="highest",
config.py) was previously hand-measured only. This script freezes one
(weights, input, torch-output) triple at the production shape so `bench.py`
can re-assert forward numerics on the actual chip every round and emit
`onchip_parity_max_abs` into the bench JSON.

Run once (torch required): `python benchmarks/make_parity_fixture.py`.
The fixture stores the torch reference Net's state_dict converted to our
pytree (compat.import_torch_state_dict), a random masked batch at
B=32/C=6/T=354/R=6, and the torch eval-mode outputs (hidden, rec).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

sys.modules.setdefault(
    "warmup_scheduler", types.SimpleNamespace(GradualWarmupScheduler=object)
)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

B, C, T, R, HOURS = 32, 6, 354, 6, 6
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "onchip_parity.npz")


def main():
    import torch

    from pretrain_interp import Net  # reference, read-only

    from deep_interpolation_clustering_tpu.compat import import_torch_state_dict
    from deep_interpolation_clustering_tpu.train.checkpoint import _flatten_nested

    torch.manual_seed(7529)
    args = types.SimpleNamespace(
        num_variables=C, num_timestamps=T, ref_points=R,
        hours_from_admission=HOURS, dropout=0.2, fake_detection=False,
        triple_margin=0.0, aux_tasks={}, loss="ae_mse", scale=5,
    )
    model = Net(args, torch.device("cpu"))
    model.eval()

    rng = np.random.RandomState(7529)
    mask = np.zeros((B, C, T), np.float32)
    for i in range(B):
        for j in range(C):
            mask[i, j, : rng.randint(3, T + 1)] = 1.0
    ob = (rng.rand(B, C, T).astype(np.float32) * 5 - 2.5) * mask
    ts = np.sort(rng.rand(B, C, T).astype(np.float32) * HOURS, axis=-1) * mask
    x = np.concatenate([ob, mask, ts, mask], axis=1)

    with torch.no_grad():
        hidden, rec, _ = model(torch.tensor(x), None, None, None)

    params, state = import_torch_state_dict(model.state_dict())
    arrays = {f"params/{k}": v for k, v in _flatten_nested(params).items()}
    arrays.update({f"state/{k}": v for k, v in _flatten_nested(state).items()})
    arrays["x"] = x
    arrays["torch_hidden"] = hidden.numpy()
    arrays["torch_rec"] = rec.numpy()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {os.path.abspath(OUT)} "
          f"({os.path.getsize(OUT) / 1e6:.1f} MB): "
          f"hidden {arrays['torch_hidden'].shape}, rec {arrays['torch_rec'].shape}")


if __name__ == "__main__":
    main()
