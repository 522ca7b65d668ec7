"""On-device DBSCAN == sklearn DBSCAN, label for label.

cluster/dbscan.py's parity argument: component ids follow ascending
min-core-index (sklearn's cluster-creation scan order) and borders join the
earliest-created neighboring cluster (the min-label rule). These tests
check exact equality across eps/min_samples regimes that exercise cores,
borders, noise, chained components, and the ragged final block.
"""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")
from sklearn.cluster import DBSCAN  # noqa: E402

from deep_interpolation_clustering_tpu import Config  # noqa: E402
from deep_interpolation_clustering_tpu.cluster.dbscan import (  # noqa: E402
    dbscan_fit,
    fit_dbscan_impl,
)


def _oracle(x, eps, min_samples):
    fit = DBSCAN(eps=eps, min_samples=min_samples).fit(x)
    core = np.zeros(len(x), bool)
    core[fit.core_sample_indices_] = True
    return fit.labels_, core


def _blobs(rng, n_per=60, k=3, d=5, spread=0.3):
    parts = [
        (rng.randn(n_per, d) * spread + 4.0 * i).astype(np.float32)
        for i in range(k)
    ]
    # sprinkle far-out noise points
    parts.append((rng.rand(7, d) * 40 - 20).astype(np.float32))
    x = np.concatenate(parts)
    rng.shuffle(x)  # arbitrary scan order: parity must not rely on layout
    return x


@pytest.mark.parametrize("eps,min_samples", [(1.0, 6), (0.8, 4), (2.0, 10)])
def test_dbscan_matches_sklearn_blobs(rng, eps, min_samples):
    x = _blobs(rng)
    labels, core = dbscan_fit(x, eps, min_samples, block=64)  # ragged blocks
    ref_labels, ref_core = _oracle(x, eps, min_samples)
    np.testing.assert_array_equal(core, ref_core)
    np.testing.assert_array_equal(labels, ref_labels)


def test_dbscan_chained_component(rng):
    """A long chain (diameter >> 1) exercises the propagation loop and the
    pointer-jumping acceleration: one cluster, no shortcuts available."""
    t = np.linspace(0, 20, 300).astype(np.float32)
    x = np.stack([t, np.sin(t).astype(np.float32)], axis=1)
    x += rng.randn(*x.shape).astype(np.float32) * 0.01
    labels, core = dbscan_fit(x, 0.25, 3, block=32)
    ref_labels, ref_core = _oracle(x, 0.25, 3)
    np.testing.assert_array_equal(core, ref_core)
    np.testing.assert_array_equal(labels, ref_labels)


def test_dbscan_all_noise_and_all_one_cluster(rng):
    x = (rng.rand(50, 4) * 100).astype(np.float32)  # sparse: all noise
    labels, _ = dbscan_fit(x, 0.01, 3)
    assert (labels == -1).all()
    x2 = rng.randn(50, 4).astype(np.float32) * 0.01  # dense: one cluster
    labels2, core2 = dbscan_fit(x2, 1.0, 3)
    assert (labels2 == 0).all() and core2.all()


def test_fit_dbscan_impl_dispatch(rng):
    x = _blobs(rng, n_per=30, k=2)
    dev_l, dev_c = fit_dbscan_impl(Config(dbscan_impl="device"), x, 1.0, 5)
    skl_l, skl_c = fit_dbscan_impl(Config(dbscan_impl="sklearn"), x, 1.0, 5)
    np.testing.assert_array_equal(dev_l, skl_l)
    np.testing.assert_array_equal(dev_c, skl_c)
    # Config itself rejects bad values at construction, so reach the
    # dispatcher's own error branch through a stub cfg
    import types

    with pytest.raises(ValueError, match="dbscan_impl"):
        fit_dbscan_impl(types.SimpleNamespace(dbscan_impl="bogus"), x, 1.0, 5)
