"""On-device k-means: k-means++ init, Lloyd iterations, best-of-n-init.

The reference round-trips latents GPU→CPU→sklearn for every k-means call
(clustering_trainer.py:74-82, p2_clustering_optK.py:260-263,
p4_clustering_final.py:159). Here the whole algorithm is jitted JAX: the
(N, K) distance computation is a single MXU matmul chain, Lloyd updates are
segment-sums, and the `n_init` restarts run as one vmapped batch — so K
selection over the 100k-encounter cohort never leaves the device.

Semantics follow sklearn.cluster.KMeans: greedy k-means++ with
`2 + floor(log k)` local trials, Lloyd iterations to `max_iter=300` with
relative tolerance `tol=1e-4` scaled by the data variance, empty clusters
re-seeded from the farthest points, and best-of-`n_init` selection by
inertia. Randomness is an explicit PRNG key — the seeded determinism the
reference never had (it neither seeds sklearn nor torch).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class KMeansResult(NamedTuple):
    centers: Array  # (K, D)
    labels: Array  # (N,)
    inertia: Array  # scalar
    n_iter: Array  # scalar


def pairwise_sq_dist(x: Array, y: Array, precision: str = "highest") -> Array:
    """Squared Euclidean distances `(N, M)` via the matmul identity —
    one MXU pass instead of materializing (N, M, D) differences.

    Default "highest" keeps cluster *assignments* exact on TPU (bf16
    matmul operands can flip borderline argmins); the O(N^2) aggregate
    metric sweeps pass "default" since their statistics tolerate it.
    """
    x_sq = jnp.sum(jnp.square(x), axis=1, keepdims=True)
    y_sq = jnp.sum(jnp.square(y), axis=1)
    d = x_sq - 2.0 * jnp.matmul(x, y.T, precision=precision) + y_sq
    return jnp.maximum(d, 0.0)


def _kmeanspp_init(key: Array, x: Array, k: int) -> Array:
    """Greedy k-means++ (Arthur & Vassilvitskii; sklearn's variant with
    `n_local_trials` candidate sampling)."""
    n, d = x.shape
    n_trials = 2 + int(np.floor(np.log(k))) if k > 1 else 1

    k0, key = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, n)]
    centers0 = jnp.zeros((k, d), x.dtype).at[0].set(first)
    closest0 = pairwise_sq_dist(x, first[None, :])[:, 0]  # (N,)

    def body(i, carry):
        centers, closest, key = carry
        key, k_cand = jax.random.split(key)
        # sample candidates proportional to D^2
        logits = jnp.log(jnp.maximum(closest, 1e-30))
        cand_idx = jax.random.categorical(k_cand, logits, shape=(n_trials,))
        cand = x[cand_idx]  # (T, D)
        dist_to_cand = pairwise_sq_dist(x, cand)  # (N, T)
        new_closest = jnp.minimum(closest[:, None], dist_to_cand)  # (N, T)
        pot = jnp.sum(new_closest, axis=0)  # (T,)
        best = jnp.argmin(pot)
        centers = centers.at[i].set(cand[best])
        closest = new_closest[:, best]
        return centers, closest, key

    centers, _, _ = jax.lax.fori_loop(1, k, body, (centers0, closest0, key))
    return centers


def _lloyd(
    x: Array, centers: Array, max_iter: int, tol: Array
) -> Tuple[Array, Array, Array, Array]:
    n, d = x.shape
    k = centers.shape[0]

    def assign(centers):
        dist = pairwise_sq_dist(x, centers)
        labels = jnp.argmin(dist, axis=1)
        min_dist = jnp.take_along_axis(dist, labels[:, None], axis=1)[:, 0]
        return labels, min_dist

    def update(centers):
        labels, min_dist = assign(centers)
        one_hot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # (N, K)
        counts = jnp.sum(one_hot, axis=0)  # (K,)
        sums = one_hot.T @ x  # (K, D) — MXU
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty clusters: re-seed from the points farthest from their center
        # (sklearn's relocation strategy)
        far_order = jnp.argsort(-min_dist)
        empty_rank = jnp.cumsum(counts == 0) - 1  # rank among empties
        reseed = x[far_order[jnp.clip(empty_rank, 0, n - 1)]]
        new_centers = jnp.where((counts == 0)[:, None], reseed, new_centers)
        return new_centers, labels

    def cond(carry):
        _, _, shift, it = carry
        return jnp.logical_and(shift > tol, it < max_iter)

    def body(carry):
        centers, _, _, it = carry
        new_centers, labels = update(centers)
        shift = jnp.sum(jnp.square(new_centers - centers))
        return new_centers, labels, shift, it + 1

    init = (centers, jnp.zeros((n,), jnp.int32), jnp.asarray(jnp.inf, x.dtype), 0)
    centers, _, _, n_iter = jax.lax.while_loop(cond, body, init)
    labels, min_dist = assign(centers)
    inertia = jnp.sum(min_dist)
    return centers, labels, inertia, n_iter


@partial(jax.jit, static_argnames=("k", "n_init", "max_iter"))
def kmeans_fit(
    key: Array,
    x: Array,
    k: int,
    n_init: int = 10,
    max_iter: int = 300,
    tol: float = 1e-4,
) -> KMeansResult:
    """Fit k-means; returns the best of `n_init` restarts by inertia."""
    x = jnp.asarray(x, jnp.float32)
    # sklearn scales tol by the mean per-feature variance
    tol_scaled = tol * jnp.mean(jnp.var(x, axis=0))

    def one(key):
        centers0 = _kmeanspp_init(key, x, k)
        return _lloyd(x, centers0, max_iter, tol_scaled)

    centers, labels, inertia, n_iter = jax.vmap(one)(jax.random.split(key, n_init))
    best = jnp.argmin(inertia)
    return KMeansResult(centers[best], labels[best], inertia[best], n_iter[best])


@jax.jit
def kmeans_predict(centers: Array, x: Array) -> Array:
    return jnp.argmin(pairwise_sq_dist(jnp.asarray(x, jnp.float32), centers), axis=1)


@jax.jit
def kmeans_inertia(centers: Array, x: Array) -> Array:
    d = pairwise_sq_dist(jnp.asarray(x, jnp.float32), centers)
    return jnp.sum(jnp.min(d, axis=1))


@jax.jit
def mean_min_distance(centers: Array, x: Array) -> Array:
    """Mean distance-to-closest-center — the elbow 'distortion' of the
    reference (p2_clustering_optK.py:260-265, scipy `cdist(...).min(1).mean()`)."""
    d = pairwise_sq_dist(jnp.asarray(x, jnp.float32), centers)
    return jnp.mean(jnp.sqrt(jnp.min(d, axis=1)))


def fit_kmeans_impl(cfg, seed: int, x, k: int, n_init: int) -> KMeansResult:
    """Dispatch on `cfg.kmeans_impl`: on-device jitted k-means (production)
    or the host-side sklearn-exact mirror (migration validation — identical
    labels to `sklearn.KMeans(n_init, random_state=seed)`). Shared by the
    p4 final labeler and the p3 DEC center init."""
    if cfg.kmeans_impl == "sklearn":
        from .sklearn_compat import kmeans_fit_sklearn

        return kmeans_fit_sklearn(x, k, n_init=n_init, random_state=seed)
    if cfg.kmeans_impl != "device":
        raise ValueError(f"unknown kmeans_impl {cfg.kmeans_impl!r}")
    return kmeans_fit(jax.random.PRNGKey(seed), x, k, n_init=n_init)
