"""Internal validity metrics + gap inertias vs sklearn / reference-formula oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from deep_interpolation_clustering_tpu.cluster import (
    silhouette_score,
    calinski_harabasz_score,
    davies_bouldin_score,
    dunn_index,
    inertia_v1,
    inertia_v2,
    kneedle,
)


@pytest.fixture
def labeled_blobs(rng):
    k, d = 4, 12
    centers = rng.randn(k, d) * 6
    labels = rng.randint(0, k, 300)
    x = (centers[labels] + rng.randn(300, d)).astype(np.float32)
    return x, labels, k


def test_silhouette_matches_sklearn(labeled_blobs):
    from sklearn.metrics import silhouette_score as sk

    x, labels, k = labeled_blobs
    got = float(silhouette_score(jnp.asarray(x), jnp.asarray(labels), k, block=64))
    np.testing.assert_allclose(got, sk(x, labels), rtol=1e-4, atol=1e-5)


def test_ch_matches_sklearn(labeled_blobs):
    from sklearn.metrics import calinski_harabasz_score as sk

    x, labels, k = labeled_blobs
    got = float(calinski_harabasz_score(jnp.asarray(x), jnp.asarray(labels), k))
    np.testing.assert_allclose(got, sk(x, labels), rtol=1e-3)


def test_db_matches_sklearn(labeled_blobs):
    from sklearn.metrics import davies_bouldin_score as sk

    x, labels, k = labeled_blobs
    got = float(davies_bouldin_score(jnp.asarray(x), jnp.asarray(labels), k))
    np.testing.assert_allclose(got, sk(x, labels), rtol=1e-4, atol=1e-5)


def test_dunn_matches_reference_formula(labeled_blobs):
    """Oracle: the reference's O(n^2) definition (internal_eval.py:37-109) —
    min inter-cluster nearest-point distance / max cluster diameter."""
    from scipy.spatial.distance import cdist

    x, labels, k = labeled_blobs
    d = cdist(x, x)
    min_inter = np.inf
    max_diam = 0.0
    for i in range(k):
        for j in range(k):
            if i == j:
                max_diam = max(max_diam, d[np.ix_(labels == i, labels == i)].max())
            else:
                min_inter = min(min_inter, d[np.ix_(labels == i, labels == j)].min())
    want = min_inter / max_diam
    got = float(dunn_index(jnp.asarray(x), jnp.asarray(labels), k, block=64))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gap_inertias_match_reference_formulas(labeled_blobs):
    """Oracles: p2_clustering_optK.py:334-351."""
    from sklearn.metrics import pairwise_distances

    x, labels, k = labeled_blobs
    w1 = np.mean(
        [np.mean(pairwise_distances(x[labels == c])) for c in np.unique(labels)]
    )
    got1 = float(inertia_v1(jnp.asarray(x), jnp.asarray(labels), k, block=64))
    np.testing.assert_allclose(got1, w1, rtol=1e-4)

    w2 = sum(
        np.sum(pairwise_distances(x[labels == c])) / (2 * np.sum(labels == c))
        for c in np.unique(labels)
    )
    got2 = float(inertia_v2(jnp.asarray(x), jnp.asarray(labels), k, block=64))
    np.testing.assert_allclose(got2, w2, rtol=1e-4)


def test_metrics_with_nondivisible_block(labeled_blobs):
    """Blocked sweep must be exact when N % block != 0."""
    from sklearn.metrics import silhouette_score as sk

    x, labels, k = labeled_blobs
    got = float(silhouette_score(jnp.asarray(x), jnp.asarray(labels), k, block=77))
    np.testing.assert_allclose(got, sk(x, labels), rtol=1e-4, atol=1e-5)


def test_kneedle_finds_elbow():
    # convex decreasing: 1/x has its kneedle knee where curvature peaks
    x = np.arange(1, 21, dtype=float)
    y = 1.0 / x
    knee = kneedle(x, y, curve="convex", direction="decreasing")
    assert knee is not None and 2 <= knee <= 5

    # concave increasing
    y2 = np.log(x)
    knee2 = kneedle(x, y2, curve="concave", direction="increasing")
    assert knee2 is not None and 2 <= knee2 <= 6

    # degenerate
    assert kneedle(x, np.ones_like(x)) is None


def test_kth_neighbor_distance_sklearn_oracle(rng):
    """Blocked MXU k-NN distances == sklearn NearestNeighbors, including
    the ragged final block and self-exclusion."""
    from sklearn.neighbors import NearestNeighbors

    from deep_interpolation_clustering_tpu.cluster.metrics import (
        kth_neighbor_distance,
    )

    x = rng.randn(257, 8).astype(np.float32)
    for k in (1, 4, 10):
        ours = np.asarray(kth_neighbor_distance(jnp.asarray(x), k, block=64))
        nn = NearestNeighbors(n_neighbors=k + 1).fit(x)  # +1: includes self
        dist, _ = nn.kneighbors(x)
        np.testing.assert_allclose(ours, dist[:, -1], rtol=1e-4, atol=1e-5)
