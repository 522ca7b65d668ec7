"""On-device DBSCAN: blocked MXU distance sweeps + min-label propagation.

The reference runs sklearn DBSCAN on the host for the p2 eps sweep
(p2_clustering_optK.py:109-168) and the p4 final labeling
(p4_clustering_final.py:175-233) — at 100k×256-d latents that is a large
O(n²d) CPU radius query on data that already lives in HBM. Here the whole
fit is jitted XLA:

  * core mask: one blocked pass counts |{j : d(i,j) <= eps}| (self
    included, sklearn's min_samples convention) as (block, N) matmul slabs
    (`pairwise_sq_dist` identity) on the MXU;
  * clusters: connected components of the core-core eps-graph via min-label
    propagation — every core starts labeled with its own index, each round
    takes the min label over its core neighbors (one blocked n² pass), and
    a pointer-jumping compression (`labels[labels]`, O(n) gathers) squares
    the propagation radius so the `while_loop` converges in
    O(log diameter) heavy rounds instead of O(diameter);
  * borders: a non-core point takes the min component label among its core
    neighbors; points with none are noise (-1).

Label parity with sklearn is EXACT, not approximate, because sklearn's
ordering is recoverable: its cluster ids follow the scan order of cluster
creation, i.e. ascending minimum-core-index per component (the scan hits a
component's lowest-index core first), and a border point is claimed by the
earliest-created neighboring cluster — exactly the min-label rule above.
The only divergence channel is float rounding of boundary-exact distances
(both sides compute d² by the matmul identity, with different reduction
orders). Verified against sklearn on blobs with borders/noise/ragged
blocks (tests/test_dbscan_device.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .kmeans import pairwise_sq_dist

Array = jax.Array


@partial(jax.jit, static_argnames=("block",))
def _dbscan_labels(x: Array, eps: Array, min_samples: Array, block: int):
    """Component labels per row: a core's component = min core index in it,
    a border's = min neighboring component label, noise = -1."""
    n, d = x.shape
    n_pad = -(-n // block) * block
    x_pad = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    blocks = x_pad.reshape(n_pad // block, block, d)
    ids = jnp.arange(n_pad, dtype=jnp.int32).reshape(n_pad // block, block)
    eps_sq = jnp.asarray(eps, jnp.float32) ** 2

    def nb_mask(xb):
        # (block, N) eps-neighborhood over the REAL rows only
        return pairwise_sq_dist(xb, x) <= eps_sq

    counts = jax.lax.map(
        lambda xb: jnp.sum(nb_mask(xb), axis=1, dtype=jnp.int32), blocks
    ).reshape(-1)[:n]
    core = counts >= min_samples  # (n,) — self counted via d(i,i)=0
    core_pad = jnp.pad(core, (0, n_pad - n))

    sentinel = jnp.int32(n_pad)

    def min_core_neighbor(labels, xb, want_mask):
        """Per row of the block: min label among CORE eps-neighbors, or
        sentinel when there are none / the row is not in want_mask."""
        m = nb_mask(xb) & core[None, :]
        cand = jnp.min(
            jnp.where(m, labels[:n][None, :], sentinel), axis=1
        )
        return jnp.where(want_mask, cand, sentinel)

    def propagate(labels):
        def per_block(args):
            xb, idb = args
            return min_core_neighbor(labels, xb, core_pad[idb])
        cand = jax.lax.map(per_block, (blocks, ids)).reshape(-1)
        new = jnp.minimum(labels, cand)
        # pointer jumping: label -> its label's label, squaring the reach
        new = jnp.minimum(new, new[new])
        return new

    labels0 = jnp.arange(n_pad, dtype=jnp.int32)

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        new = propagate(labels)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))

    # borders: min component label among core neighbors; else noise
    def border_block(args):
        xb, idb = args
        return min_core_neighbor(labels, xb, ~core_pad[idb])
    border = jax.lax.map(border_block, (blocks, ids)).reshape(-1)

    out = jnp.where(core_pad, labels, jnp.where(border < sentinel, border, -1))
    return out[:n], core


def dbscan_fit(
    x, eps: float, min_samples: int, block: int = 1024
) -> tuple:
    """sklearn-identical DBSCAN labels, fully on device.

    Returns (labels, core_mask) as numpy arrays; labels use sklearn's ids
    (consecutive ints in cluster-creation order, noise = -1)."""
    x = jnp.asarray(x, jnp.float32)
    raw, core = _dbscan_labels(
        x, jnp.float32(eps), jnp.int32(min_samples), block
    )
    raw = np.asarray(raw)
    core = np.asarray(core)
    out = np.full(len(raw), -1, np.int64)
    clustered = raw >= 0
    if clustered.any():
        # component keys are min-core indices; ascending order IS sklearn's
        # cluster-creation order
        uniq, inv = np.unique(raw[clustered], return_inverse=True)
        out[clustered] = inv
    return out, core


def fit_dbscan_impl(cfg, x, eps: float, min_samples: int):
    """Dispatch on `cfg.dbscan_impl`: on-device blocked fit (production) or
    host sklearn (the reference's path). Shared by the p2 eps sweep and the
    p4 dbscan labeler; both impls produce identical labels (tested)."""
    if cfg.dbscan_impl == "sklearn":
        from sklearn.cluster import DBSCAN

        fit = DBSCAN(eps=eps, min_samples=min_samples).fit(np.asarray(x))
        labels = fit.labels_
        core = np.zeros(len(labels), bool)
        core[fit.core_sample_indices_] = True
        return labels, core
    if cfg.dbscan_impl != "device":
        raise ValueError(f"unknown dbscan_impl {cfg.dbscan_impl!r}")
    return dbscan_fit(x, eps, min_samples)
