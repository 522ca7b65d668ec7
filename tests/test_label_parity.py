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


def _single_threaded_sklearn():
    """Pin sklearn's BLAS/OpenMP pools to one thread for the bit-exactness
    fits (threadpoolctl ships with sklearn)."""
    import threadpoolctl

    return threadpoolctl.threadpool_limits(1)


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


def _align(labels, centers, ob, mask):
    """SBP-descending alignment applied to labels AND centers (p4:63-139)."""
    align_map, _, _ = generate_align_map(labels, ob, mask)
    aligned_centers = centers.copy()
    relabel = np.empty(len(align_map), np.int64)
    for org, new in align_map.items():
        aligned_centers[new] = centers[org]
        relabel[org] = new
    return relabel[labels], aligned_centers


@pytest.mark.slow
def test_label_parity_vs_real_sklearn_kmeans():
    """The p4 question the shared-centers test sidesteps: run an actual
    `sklearn.KMeans(n_init=20, random_state=s)` (reference
    p4_clustering_final.py:159, clustering_trainer.py:75) and our
    `kmeans_fit_sklearn` independently on the same PRETRAINED latents —
    identical labels/centers/inertia, and after SBP alignment identical
    per-encounter cluster ids. The on-device `kmeans_fit` (different RNG
    machinery by construction) is held to the quantified bound instead:
    same-objective inertia within 0.5% of sklearn's best-of-20."""
    sklearn_cluster = pytest.importorskip("sklearn.cluster")

    from deep_interpolation_clustering_tpu.cluster import kmeans_fit_sklearn
    from deep_interpolation_clustering_tpu.data import (
        ArrayDataset,
        make_synthetic_cohorts,
        process_splits,
    )
    from deep_interpolation_clustering_tpu.train import Trainer
    import tempfile

    k = 4  # the synthetic generator plants 4 phenotypes
    raw = make_synthetic_cohorts(n_total=240, max_obs=24, seed=21)
    cohorts = process_splits(raw, rng=np.random.RandomState(0))
    cfg = Config(
        batch_size=16, num_timestamps=24, max_epochs=3, early_stopping=50,
        log_train_freq=1000, log_valid_freq=1000,
    )
    datasets = {c: ArrayDataset(cfg, d, c) for c, d in cohorts.items()}
    with tempfile.TemporaryDirectory() as tmp:
        tr = Trainer(cfg, datasets, tmp, use_tensorboard=False)
        tr.train()
        _, dumps = tr.eval_one_epoch(
            "train", datasets["training"], denoise=False, dump_keys=("hidden",)
        )
        merged = tr.merge_ob_pred(datasets["training"], dumps)
    hidden, ob, mask = merged["hidden"], merged["ob"], merged["padding_mask"]

    # bit-exactness holds only single-threaded (sklearn_compat docstring):
    # multi-threaded lloyd reduces center sums in thread order and low-order
    # bits drift. n<=256 happens to fit one lloyd chunk today, but pin it so
    # the test stays stable if sizes grow.
    with _single_threaded_sklearn():
        sk = sklearn_cluster.KMeans(
            n_clusters=k, n_init=20, random_state=0, algorithm="lloyd"
        ).fit(hidden)
    ours = kmeans_fit_sklearn(hidden, k, n_init=20, random_state=0)

    # bit-exact parity on the raw fit
    np.testing.assert_array_equal(np.asarray(ours.labels), sk.labels_)
    np.testing.assert_allclose(
        np.asarray(ours.centers), sk.cluster_centers_, rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(float(ours.inertia), float(sk.inertia_), rtol=1e-6)

    # and through the p4 alignment: identical aligned ids + interchangeable
    # centers on a held-out perturbation
    sk_aligned, sk_centers = _align(
        sk.labels_.astype(np.int64), np.asarray(sk.cluster_centers_), ob, mask
    )
    our_aligned, our_centers = _align(
        np.asarray(ours.labels), np.asarray(ours.centers), ob, mask
    )
    np.testing.assert_array_equal(our_aligned, sk_aligned)
    valid_hidden = hidden + np.random.RandomState(7).normal(
        0, 1e-3, hidden.shape
    ).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(kmeans_predict(our_centers, valid_hidden)),
        np.asarray(kmeans_predict(sk_centers, valid_hidden)),
    )

    # the on-device path: same objective to within 0.5% on these latents
    # (measured gap ~0.1%; under-trained latents have many near-degenerate
    # optima, and with n_init=100 the on-device fit lands BELOW sklearn's)
    dev = kmeans_fit(jax.random.PRNGKey(0), hidden, k, n_init=20)
    assert abs(float(dev.inertia) - float(sk.inertia_)) / float(sk.inertia_) < 5e-3


def test_sklearn_compat_exact_on_blobs():
    """kmeans_fit_sklearn == sklearn.KMeans bit-for-bit across data shapes,
    seeds, and separations (including pure noise, where the RNG path is the
    only thing deciding the outcome)."""
    sklearn_cluster = pytest.importorskip("sklearn.cluster")
    from deep_interpolation_clustering_tpu.cluster import kmeans_fit_sklearn

    for seed in range(4):
        rng = np.random.RandomState(seed)
        n, d, k = 200, 16, 4
        if seed == 3:
            x = rng.randn(n, d).astype(np.float32)  # no structure at all
        else:
            c = rng.randn(k, d) * (1 + seed)
            x = (c[rng.randint(k, size=n)] + rng.randn(n, d)).astype(np.float32)
        for s in (0, 11):
            with _single_threaded_sklearn():
                sk = sklearn_cluster.KMeans(
                    n_clusters=k, n_init=10, random_state=s, algorithm="lloyd"
                ).fit(x)
            ours = kmeans_fit_sklearn(x, k, n_init=10, random_state=s)
            np.testing.assert_array_equal(np.asarray(ours.labels), sk.labels_)
            np.testing.assert_allclose(
                float(ours.inertia), float(sk.inertia_), rtol=1e-6
            )
            assert int(ours.n_iter) == int(sk.n_iter_)
