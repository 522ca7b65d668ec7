"""End-to-end cluster-label parity (BASELINE.md north star): with the same
weights, latents produced by this framework and by the torch reference are
interchangeable — the full p4 labeling pipeline (k-means -> SBP-descending
alignment) yields EXACTLY the same cluster ids either way.
"""

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

import jax

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.cluster import (
    generate_align_map,
    kmeans_fit,
    kmeans_predict,
)
from deep_interpolation_clustering_tpu.compat import import_torch_state_dict
from deep_interpolation_clustering_tpu.models import forward

B, C, T, R, HOURS, K = 64, 6, 30, 6, 6, 3


def _planes(rng, n):
    mask = np.zeros((n, C, T), np.float32)
    for i in range(n):
        for j in range(C):
            mask[i, j, : rng.randint(3, T + 1)] = 1.0
    ob = (rng.rand(n, C, T).astype(np.float32) * 5 - 2.5) * mask
    ts = np.sort(rng.rand(n, C, T).astype(np.float32) * HOURS, axis=-1) * mask
    x = np.concatenate([ob, mask, ts, mask], axis=1)
    return x, ob, mask


def test_cluster_label_parity_vs_torch(rng):
    from pretrain_interp import Net

    args = types.SimpleNamespace(
        num_variables=C, num_timestamps=T, ref_points=R, hours_from_admission=HOURS,
        dropout=0.2, fake_detection=False, triple_margin=0.0,
        aux_tasks={}, loss="ae_mse", scale=5,
    )
    model = Net(args, torch.device("cpu"))
    model.eval()
    cfg = Config(
        num_variables=C, num_timestamps=T, ref_points=R,
        hours_from_admission=HOURS, fake_detection=False, aux_tasks={},
    )
    params, state = import_torch_state_dict(model.state_dict())

    x, ob, mask = _planes(rng, B)
    with torch.no_grad():
        torch_hidden, _, _ = model(torch.tensor(x), None, None, None)
    torch_hidden = torch_hidden.numpy()
    ours_hidden = np.asarray(forward(params, state, cfg, x, train=False).hidden)

    # latents interchangeable at float32 epsilon
    np.testing.assert_allclose(ours_hidden, torch_hidden, rtol=1e-5, atol=1e-5)

    # p4 pipeline: k-means on OUR latents, alignment by SBP, then label both
    # latent sets with the aligned centers -> identical cluster ids
    result = kmeans_fit(jax.random.PRNGKey(0), ours_hidden, K, n_init=5)
    train_raw = np.asarray(kmeans_predict(result.centers, ours_hidden))
    align_map, _, _ = generate_align_map(train_raw, ob, mask)
    centers = np.asarray(result.centers)
    aligned_centers = centers.copy()
    for org, new in align_map.items():
        aligned_centers[new] = centers[org]

    ours_labels = np.asarray(kmeans_predict(aligned_centers, ours_hidden))
    torch_labels = np.asarray(kmeans_predict(aligned_centers, torch_hidden))
    np.testing.assert_array_equal(ours_labels, torch_labels)
