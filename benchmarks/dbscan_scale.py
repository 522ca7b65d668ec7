"""Device vs sklearn DBSCAN + k-distance at scale (latent-shaped data).

Times the three p2/p4 clustering-analytics primitives on synthetic
256-d latents (the production latent width):

  * k-distance curve (`metrics.kth_neighbor_distance` vs sklearn
    NearestNeighbors)
  * one DBSCAN fit (`cluster/dbscan.dbscan_fit` vs sklearn DBSCAN)
  * the default 9-point eps sweep

Run: `python benchmarks/dbscan_scale.py [--n 100000] [--d 256] [--skip-host]`
(`--skip-host` when the sklearn pass would take too long to wait for).
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def latents(rng, n, d, k=4):
    centers = rng.randn(k, d).astype(np.float32) * 2.0
    lbl = rng.randint(0, k, size=n)
    return (centers[lbl] + rng.randn(n, d).astype(np.float32) * 0.4), lbl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--knn", type=int, default=None,
                    help="k for the k-distance curve (default d)")
    ap.add_argument("--eps", type=float, default=8.0)
    ap.add_argument("--min_samples", type=int, default=None)
    ap.add_argument("--skip-host", action="store_true")
    args = ap.parse_args()
    knn = args.knn or args.d
    min_samples = args.min_samples or (args.d + 1)

    import jax.numpy as jnp

    from deep_interpolation_clustering_tpu.cluster.dbscan import dbscan_fit
    from deep_interpolation_clustering_tpu.cluster.metrics import (
        kth_neighbor_distance,
    )

    rng = np.random.RandomState(0)
    x, _ = latents(rng, args.n, args.d)
    xd = jnp.asarray(x)

    def timed(fn):
        fn()  # compile + warm
        t0 = time.perf_counter()
        out = fn()
        return time.perf_counter() - t0, out

    sec, kth = timed(lambda: np.asarray(kth_neighbor_distance(xd, knn)))
    print(json.dumps({"metric": "kdistance_device_sec", "n": args.n,
                      "d": args.d, "k": knn, "value": round(sec, 2)}),
          flush=True)

    sec, (labels, core) = timed(lambda: dbscan_fit(xd, args.eps, min_samples))
    n_clusters = int(labels.max()) + 1
    print(json.dumps({"metric": "dbscan_device_sec", "n": args.n,
                      "eps": args.eps, "min_samples": min_samples,
                      "n_clusters": n_clusters,
                      "n_noise": int((labels == -1).sum()),
                      "value": round(sec, 2)}), flush=True)

    if not args.skip_host:
        from sklearn.cluster import DBSCAN
        from sklearn.neighbors import NearestNeighbors

        t0 = time.perf_counter()
        nn = NearestNeighbors(n_neighbors=knn + 1).fit(x)
        dist, _ = nn.kneighbors(x)
        host_kd = time.perf_counter() - t0
        np.testing.assert_allclose(np.sort(kth), np.sort(dist[:, -1]),
                                   rtol=1e-3, atol=1e-3)
        print(json.dumps({"metric": "kdistance_sklearn_sec", "n": args.n,
                          "value": round(host_kd, 2)}), flush=True)

        t0 = time.perf_counter()
        ref = DBSCAN(eps=args.eps, min_samples=min_samples).fit_predict(x)
        host_db = time.perf_counter() - t0
        match = bool((ref == labels).all())
        print(json.dumps({"metric": "dbscan_sklearn_sec", "n": args.n,
                          "labels_match": match,
                          "value": round(host_db, 2)}), flush=True)


if __name__ == "__main__":
    main()
