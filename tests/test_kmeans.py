"""On-device k-means vs sklearn oracle."""

import numpy as np
import pytest

import jax

from deep_interpolation_clustering_tpu.cluster import (
    kmeans_fit,
    kmeans_predict,
    kmeans_inertia,
    mean_min_distance,
    pairwise_sq_dist,
)


def _blobs(rng, n=600, k=4, d=16, spread=8.0):
    centers = rng.randn(k, d) * spread
    labels = rng.randint(0, k, n)
    x = centers[labels] + rng.randn(n, d)
    return x.astype(np.float32), labels, centers


def test_pairwise_sq_dist_matches_numpy(rng):
    x = rng.randn(50, 8).astype(np.float32)
    y = rng.randn(20, 8).astype(np.float32)
    got = np.asarray(pairwise_sq_dist(x, y))
    want = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_kmeans_recovers_blobs(rng):
    x, true_labels, _ = _blobs(rng)
    result = kmeans_fit(jax.random.PRNGKey(0), x, 4, n_init=5)
    labels = np.asarray(result.labels)
    # every true cluster maps to exactly one predicted cluster
    maps = set()
    for t in range(4):
        pred = labels[true_labels == t]
        assert len(np.unique(pred)) == 1
        maps.add(int(pred[0]))
    assert len(maps) == 4


def test_kmeans_matches_sklearn_inertia(rng):
    sklearn = pytest.importorskip("sklearn.cluster")
    x, _, _ = _blobs(rng, n=400, k=3)
    ours = kmeans_fit(jax.random.PRNGKey(1), x, 3, n_init=10)
    ref = sklearn.KMeans(n_clusters=3, n_init=10, random_state=0).fit(x)
    # same optimum on well-separated blobs
    np.testing.assert_allclose(float(ours.inertia), ref.inertia_, rtol=1e-3)
    # centers match up to permutation
    d = np.asarray(pairwise_sq_dist(np.asarray(ours.centers), ref.cluster_centers_))
    assert d.min(axis=1).max() < 1e-2


def test_kmeans_predict_and_inertia_consistent(rng):
    x, _, _ = _blobs(rng, n=200, k=3)
    result = kmeans_fit(jax.random.PRNGKey(2), x, 3, n_init=3)
    labels = np.asarray(kmeans_predict(result.centers, x))
    np.testing.assert_array_equal(labels, np.asarray(result.labels))
    inertia = float(kmeans_inertia(result.centers, x))
    np.testing.assert_allclose(inertia, float(result.inertia), rtol=1e-5)


def test_kmeans_deterministic_under_key(rng):
    x, _, _ = _blobs(rng, n=300, k=4)
    a = kmeans_fit(jax.random.PRNGKey(3), x, 4, n_init=4)
    b = kmeans_fit(jax.random.PRNGKey(3), x, 4, n_init=4)
    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
    np.testing.assert_allclose(np.asarray(a.centers), np.asarray(b.centers))


def test_mean_min_distance_matches_cdist(rng):
    from scipy.spatial.distance import cdist

    x = rng.randn(100, 8).astype(np.float32)
    c = rng.randn(5, 8).astype(np.float32)
    got = float(mean_min_distance(c, x))
    want = cdist(x, c).min(axis=1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_kmeans_more_clusters_than_natural(rng):
    """K larger than natural cluster count must not produce empty clusters."""
    x, _, _ = _blobs(rng, n=100, k=2)
    result = kmeans_fit(jax.random.PRNGKey(4), x, 8, n_init=2)
    assert len(np.unique(np.asarray(result.labels))) == 8
