"""On-device internal cluster-validity metrics + gap-statistic inertias.

The reference computes these host-side with sklearn wrappers and a
hand-rolled O(n^2) double-Python-loop Dunn index (internal_eval.py:15-147),
plus two pairwise-distance inertia variants for the gap statistic
(p2_clustering_optK.py:334-351). Here everything is one blocked pass over
the pairwise-distance matrix: rows are processed in MXU-sized blocks via
`lax.map` (the full (N, N) matrix is never materialized), yielding per-point
cluster distance sums and per-cluster-pair min/max distances, from which
silhouette, Dunn, and both inertia variants all fall out. Davies-Bouldin
and Calinski-Harabasz only need centroid distances and are direct.

Distance convention: plain Euclidean (sklearn `pairwise_distances` default),
squared only where the formula says so (CH).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kmeans import pairwise_sq_dist

Array = jax.Array


class PairwiseStats(NamedTuple):
    sums: Array  # (N, K) sum of distances from point i to cluster j's points
    counts: Array  # (K,) cluster sizes
    pair_min: Array  # (K, K) min inter-point distance between clusters
    pair_max: Array  # (K, K) max inter-point distance between clusters


@partial(jax.jit, static_argnames=("k", "block"))
def kth_neighbor_distance(x: Array, k: int, block: int = 1024) -> Array:
    """Euclidean distance to the k-th nearest neighbor (self EXCLUDED) for
    every row — the DBSCAN k-distance curve. The reference computes it
    host-side with sklearn NearestNeighbors (p2_clustering_optK.py:97-107);
    at 100k rows that is an O(n²d) CPU pass on data that already lives in
    HBM. One blocked device sweep instead: each row block computes its
    (block, N) distance slab as an MXU matmul (pairwise_sq_dist identity)
    and top_k's the k smallest; "highest" matmul precision because the
    kneedle knee reads absolute distance values, not cluster ratios."""
    n, d = x.shape
    if not 1 <= k <= n - 1:
        raise ValueError(
            f"k={k} neighbors requested but only {n} rows exist "
            f"(valid range: 1..{n - 1})"
        )
    n_pad = -(-n // block) * block
    x_pad = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    blocks = x_pad.reshape(n_pad // block, block, d)
    row_ids = jnp.arange(n_pad).reshape(n_pad // block, block)

    def per_block(args):
        xb, ids = args
        sq = pairwise_sq_dist(xb, x)  # (block, N): real columns only
        sq = jnp.where(jnp.arange(n)[None, :] == ids[:, None], jnp.inf, sq)
        neg_top, _ = jax.lax.top_k(-sq, k)  # k smallest distances
        return jnp.sqrt(jnp.maximum(-neg_top[:, -1], 0.0))

    kth = jax.lax.map(per_block, (blocks, row_ids))
    return kth.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("k", "block"))
def pairwise_cluster_stats(x: Array, labels: Array, k: int, block: int = 1024) -> PairwiseStats:
    """One blocked sweep over all pairwise distances."""
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    n_pad = -(-n // block) * block
    x_pad = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    labels_pad = jnp.pad(labels.astype(jnp.int32), (0, n_pad - n), constant_values=k)

    labels_n = labels_pad[:n]
    one_hot = jax.nn.one_hot(labels_n, k, dtype=jnp.float32)  # (N, K)
    counts = jnp.sum(one_hot, axis=0)

    blocks = x_pad.reshape(n_pad // block, block, d)
    lbl_blocks = labels_pad.reshape(n_pad // block, block)

    def per_block(args):
        xb, lb = args
        # aggregate statistics tolerate default (fast) matmul precision
        dist = jnp.sqrt(pairwise_sq_dist(xb, x, precision="default"))  # (block, N)
        sums = dist @ one_hot  # (block, K) — MXU
        # per-row min/max distance to each cluster: segment over the N axis
        row_min = jax.ops.segment_min(dist.T, labels_n, num_segments=k).T
        row_max = jax.ops.segment_max(dist.T, labels_n, num_segments=k).T
        # aggregate rows by their own label into (K, K); padded rows -> seg k
        pm = jax.ops.segment_min(row_min, lb, num_segments=k + 1)
        px = jax.ops.segment_max(row_max, lb, num_segments=k + 1)
        return sums, pm[:k], px[:k]

    sums, pmins, pmaxs = jax.lax.map(per_block, (blocks, lbl_blocks))
    sums = sums.reshape(n_pad, k)[:n]
    pair_min = jnp.min(pmins, axis=0)
    pair_max = jnp.max(pmaxs, axis=0)
    return PairwiseStats(sums, counts, pair_min, pair_max)


# ----------------------------------------------------------- silhouette
def silhouette_score(x: Array, labels: Array, k: int, block: int = 1024) -> Array:
    """Mean silhouette coefficient (sklearn.metrics.silhouette_score)."""
    stats = pairwise_cluster_stats(x, labels, k, block)
    return _silhouette_from_stats(stats, labels, k)


@partial(jax.jit, static_argnames=("k",))
def _silhouette_from_stats(stats: PairwiseStats, labels: Array, k: int) -> Array:
    labels = labels.astype(jnp.int32)
    own = jax.nn.one_hot(labels, k, dtype=jnp.float32)
    n_own = stats.counts[labels]  # (N,)
    a = jnp.sum(stats.sums * own, axis=1) / jnp.maximum(n_own - 1.0, 1.0)
    mean_other = jnp.where(
        own > 0, jnp.inf, stats.sums / jnp.maximum(stats.counts, 1.0)[None, :]
    )
    # clusters that are empty contribute inf already (counts=0 -> sums=0/1=0
    # would win the min incorrectly), mask them
    mean_other = jnp.where(stats.counts[None, :] > 0, mean_other, jnp.inf)
    b = jnp.min(mean_other, axis=1)
    s = (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-30)
    s = jnp.where(n_own > 1, s, 0.0)  # singleton clusters score 0
    return jnp.mean(s)


# ------------------------------------------------- centroid-based scores
@partial(jax.jit, static_argnames=("k",))
def calinski_harabasz_score(x: Array, labels: Array, k: int) -> Array:
    """(B/(k-1)) / (W/(n-k)) with squared Euclidean dispersions
    (sklearn.metrics.calinski_harabasz_score; internal_eval.py:131-138)."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    one_hot = jax.nn.one_hot(labels.astype(jnp.int32), k, dtype=jnp.float32)
    counts = jnp.sum(one_hot, axis=0)
    centers = (one_hot.T @ x) / jnp.maximum(counts, 1.0)[:, None]
    mean = jnp.mean(x, axis=0)
    b = jnp.sum(counts * jnp.sum(jnp.square(centers - mean), axis=1))
    diff = x - centers[labels]
    w = jnp.sum(jnp.square(diff))
    return (b / (k - 1)) / (w / (n - k))


@partial(jax.jit, static_argnames=("k",))
def davies_bouldin_score(x: Array, labels: Array, k: int) -> Array:
    """Mean over clusters of the worst (s_i + s_j) / d_ij ratio
    (sklearn.metrics.davies_bouldin_score; internal_eval.py:141-147)."""
    x = jnp.asarray(x, jnp.float32)
    one_hot = jax.nn.one_hot(labels.astype(jnp.int32), k, dtype=jnp.float32)
    counts = jnp.sum(one_hot, axis=0)
    centers = (one_hot.T @ x) / jnp.maximum(counts, 1.0)[:, None]
    dist_to_center = jnp.sqrt(
        jnp.sum(jnp.square(x - centers[labels]), axis=1)
    )
    s = (one_hot.T @ dist_to_center) / jnp.maximum(counts, 1.0)  # (K,)
    d = jnp.sqrt(pairwise_sq_dist(centers, centers))
    ratio = (s[:, None] + s[None, :]) / jnp.where(d > 0, d, jnp.inf)
    ratio = jnp.where(jnp.eye(k, dtype=bool), -jnp.inf, ratio)
    return jnp.mean(jnp.max(ratio, axis=1))


def dunn_index(x: Array, labels: Array, k: int, block: int = 1024) -> Array:
    """min inter-cluster nearest-point distance / max cluster diameter —
    the reference's hand-rolled O(n^2) Python double loop
    (internal_eval.py:37-109) as one blocked device pass."""
    stats = pairwise_cluster_stats(x, labels, k, block)
    off_diag = jnp.where(jnp.eye(k, dtype=bool), jnp.inf, stats.pair_min)
    min_inter = jnp.min(off_diag)
    max_diam = jnp.max(jnp.diagonal(stats.pair_max))
    return min_inter / max_diam


# -------------------------------------------------- gap-statistic inertia
@partial(jax.jit, static_argnames=("k", "block"))
def inertia_v1(x: Array, labels: Array, k: int, block: int = 1024) -> Array:
    """W = mean over clusters of mean(full pairwise-distance matrix within
    the cluster, diagonal zeros included) (p2_clustering_optK.py:334-342)."""
    stats = pairwise_cluster_stats(x, labels, k, block)
    own = jax.nn.one_hot(labels.astype(jnp.int32), k, dtype=jnp.float32)
    per_cluster_sum = jnp.sum(stats.sums * own, axis=0)  # (K,)
    w = per_cluster_sum / jnp.maximum(jnp.square(stats.counts), 1.0)
    present = stats.counts > 0
    return jnp.sum(jnp.where(present, w, 0.0)) / jnp.sum(present)


@partial(jax.jit, static_argnames=("k", "block"))
def inertia_v2(x: Array, labels: Array, k: int, block: int = 1024) -> Array:
    """Tibshirani W_k = sum_c D_c / (2 n_c), D_c the full within-cluster
    pairwise-distance sum (p2_clustering_optK.py:344-351)."""
    stats = pairwise_cluster_stats(x, labels, k, block)
    own = jax.nn.one_hot(labels.astype(jnp.int32), k, dtype=jnp.float32)
    per_cluster_sum = jnp.sum(stats.sums * own, axis=0)
    w = per_cluster_sum / (2.0 * jnp.maximum(stats.counts, 1.0))
    return jnp.sum(jnp.where(stats.counts > 0, w, 0.0))


INTERNAL_METRICS = {
    "Sihouette": silhouette_score,  # [sic] — reference spelling (internal_eval.py:112)
    "Davies-Bouldin_Index": davies_bouldin_score,
    "Calinski-Harabasz": calinski_harabasz_score,
    "Dunn_Index": dunn_index,
}


def compute_internal_metrics(
    names, x: np.ndarray, labels: np.ndarray, k: int
) -> Dict[str, float]:
    out = {}
    for name in names:
        fn = INTERNAL_METRICS[name]
        out[name] = float(fn(jnp.asarray(x), jnp.asarray(labels), k))
    return out
