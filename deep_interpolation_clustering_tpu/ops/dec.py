"""Deep Embedded Clustering ops (Xie/Girshick/Farhadi).

Student-t soft assignment and the target distribution, as pure functions
(reference dec.py:49-76). Cluster centers live in the model's param pytree;
Xavier-uniform init matches torch's `nn.init.xavier_uniform_` (dec.py:32-41).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def centers_init(key: Array, cluster_number: int, dim: int, dtype=jnp.float32) -> Array:
    """Xavier-uniform over a (K, dim) matrix: U(-a, a), a = sqrt(6/(K+dim))."""
    bound = jnp.sqrt(6.0 / (cluster_number + dim))
    return jax.random.uniform(key, (cluster_number, dim), dtype, -bound, bound)


def soft_assignment(centers: Array, batch: Array, alpha: float = 1.0) -> Array:
    """Student-t soft assignment q_ij (reference dec.py:49-63).

    q_ij ∝ (1 + ||z_i - mu_j||^2 / alpha)^(-(alpha+1)/2), row-normalized.
    """
    norm_sq = jnp.sum(jnp.square(batch[:, None, :] - centers[None, :, :]), axis=2)
    numerator = (1.0 + norm_sq / alpha) ** (-(alpha + 1.0) / 2.0)
    return numerator / jnp.sum(numerator, axis=1, keepdims=True)


def target_distribution(q: Array, sample_mask: Array = None) -> Array:
    """DEC target p_ij = (q^2/f_j) / sum_j'(q^2/f_j'), f_j = sum_i q_ij
    (reference dec.py:66-76). Callers must stop gradients through the
    result, matching the reference's `.detach()`
    (clustering_interp.py:186). `sample_mask` excludes shape-padding rows
    from the cluster-frequency sums f_j."""
    if sample_mask is None:
        f = jnp.sum(q, axis=0)
    else:
        f = jnp.sum(jnp.where(sample_mask[:, None] > 0, q, 0.0), axis=0)
    weight = jnp.square(q) / f
    return weight / jnp.sum(weight, axis=1, keepdims=True)
