"""p2 — optimal-K selection: elbow, gap statistic, DBSCAN/OPTICS explorers.

The reference's K-selection stage (p2_clustering_optK.py:45-420) runs
sklearn KMeans per K on the CPU with O(n^2) pairwise-distance inertias.
Here the hot path — KMeans fits, distortions, both gap-statistic inertia
variants, and the internal validity indices — is entirely on-device
(cluster.kmeans / cluster.metrics); DBSCAN and OPTICS stay host-side
sklearn since they are exploratory analytics, with the kneed dependency
replaced by our own Kneedle (cluster.kneedle).

Outputs mirror the reference: per-K CSV tables (`gap_sts_v{1,2}.csv`) and
optional matplotlib plots, plus what the reference leaves to the human —
automatic suggestions: the Kneedle elbow of the distortion curve and the
Tibshirani rule `min k : gap(k) >= gap(k+1) - s(k+1)` for the gap curve.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..parallel import device_fetch, is_main_process
from ..utils import logger
from .kmeans import kmeans_fit, mean_min_distance
from .kneedle import kneedle
from .metrics import compute_internal_metrics, inertia_v1, inertia_v2


def _rows_f32(x):
    """f32 rows WITHOUT forcing a host round-trip: jax arrays stay on
    device — every K-selection hot op (k-means, distortions, inertias,
    internal indices) is on-device anyway, and callers holding
    device-resident latents (`eval_one_epoch(device_dumps=True)`) would
    otherwise pay minutes of D2H over a tunneled backend at 100k+ scale.
    Host inputs become contiguous f32 np arrays exactly as before."""
    if isinstance(x, jax.Array):
        return x if x.dtype == jnp.float32 else x.astype(jnp.float32)
    return np.asarray(x, np.float32)


def _read_gap_csv(path: str) -> List[Dict]:
    """Reload a previous gap sweep's table (k as int, everything else float)."""
    with open(path, newline="") as f:
        return [
            {k: (int(v) if k == "k" else float(v)) for k, v in row.items()}
            for row in csv.DictReader(f)
        ]


def _maybe_plot(fn):
    """Run a plotting closure if matplotlib is importable; never fatal.
    Multi-host: figures (like every artifact write here) are
    process-0-only — the analytics COMPUTE runs on all processes (GSPMD
    collectives need every participant), only the filesystem output is
    deduplicated.
    The closure runs under a seaborn-whitegrid/poster-like style built from
    plain matplotlib rcParams (the reference styles its p2 figures with
    `sns.set(style="whitegrid"); sns.set_context("poster")` and the tab10
    palette — p2_clustering_optK.py:299-330; seaborn itself stays out of
    the dependency surface)."""
    if not is_main_process():
        return
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        style = {
            "axes.grid": True,
            "grid.color": "#b0b0b0",
            "grid.linewidth": 0.8,
            "axes.edgecolor": "#cccccc",
            "axes.facecolor": "white",
            "axes.axisbelow": True,
            "axes.spines.top": False,
            "axes.spines.right": False,
            "axes.prop_cycle": plt.cycler(
                color=plt.cm.tab10(np.linspace(0, 1, 10))
            ),
            "lines.linewidth": 3,
            "lines.markersize": 9,
            "axes.labelsize": 22,
            "xtick.labelsize": 18,
            "ytick.labelsize": 18,
            "legend.fontsize": 18,
            "axes.titlesize": 24,
            "figure.autolayout": False,
        }
        with plt.rc_context(style):
            fn(plt)
    except Exception as e:  # pragma: no cover
        logger.warning("plotting skipped: %s", e)


def _relabel_legend(ax):
    """Map legend labels through LEGEND_INFO the way the reference does for
    every styled figure (p2_clustering_optK.py:316-319)."""
    from ..info import LEGEND_INFO

    leg = ax.get_legend()
    if leg is not None:
        for t in leg.get_texts():
            t.set_text(LEGEND_INFO.get(t.get_text(), t.get_text()))
    return leg


class KSelection:
    """KMeans-based K selection (reference `KM`, p2:226-410).

    `mesh`: optional `jax.sharding.Mesh` — latents are row-sharded over its
    "data" axis and GSPMD parallelizes every jitted fit (distance matmuls,
    Lloyd segment-sums) across the chips with XLA-inserted collectives; no
    algorithm changes (verified label-identical to single-device on the
    8-virtual-device CPU mesh, tests/test_align_final.py). The reference
    round-trips to host sklearn instead (p2:260-263)."""

    def __init__(self, cfg: Config, out_path: str, mesh=None):
        self.cfg = cfg
        self.out_path = os.path.join(out_path, "plot")
        self.mesh = mesh
        os.makedirs(self.out_path, exist_ok=True)

    def _put_rows(self, x: np.ndarray):
        """Row-shard latents over the mesh; pass through when there is no
        mesh or the row count does not divide it (sharding requires even
        shards — correctness never depends on this placement)."""
        if self.mesh is None:
            return x
        n_dev = self.mesh.devices.size
        if len(x) % n_dev:
            logger.warning(
                "%d rows not divisible by %d devices: running unsharded",
                len(x), n_dev,
            )
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            jax.numpy.asarray(x), NamedSharding(self.mesh, P("data", None))
        )

    # ------------------------------------------------------------ elbow
    def elbow(
        self,
        train_feat: np.ndarray,
        valid_feat: np.ndarray,
        seed: int = 0,
        plot: bool = True,
    ) -> Dict:
        """Distortion (mean min distance to center) for K=2..k_max on train
        and valid (reference p2:254-274), plus the Kneedle elbow."""
        ks = list(range(2, self.cfg.k_max + 1))
        train_feat = self._put_rows(_rows_f32(train_feat))
        valid_feat = self._put_rows(_rows_f32(valid_feat))
        train_d, valid_d = [], []
        for k in ks:
            logger.info("elbow: running K=%d", k)
            result = kmeans_fit(
                jax.random.PRNGKey(seed + k), train_feat, k, n_init=self.cfg.n_init
            )
            train_d.append(float(mean_min_distance(result.centers, train_feat)))
            valid_d.append(float(mean_min_distance(result.centers, valid_feat)))
        knee = kneedle(np.array(ks), np.array(train_d), "convex", "decreasing")
        out = {"k": ks, "train": train_d, "valid": valid_d, "elbow_k": knee}
        if is_main_process():
            with open(os.path.join(self.out_path, "elbow.csv"), "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["k", "train_distortion", "valid_distortion"])
                w.writerows(zip(ks, train_d, valid_d))
        if plot:
            def draw(plt):
                for cohort, d in (("train", train_d), ("valid", valid_d)):
                    plt.figure()
                    plt.plot(ks, d, "bx-")
                    plt.xlabel("Cluster Count", fontsize=18)
                    plt.ylabel("Distortion", fontsize=18)
                    plt.title("The Elbow method showing the optimal k", fontsize=20)
                    plt.savefig(os.path.join(self.out_path, f"{cohort}_elbow.png"))
                    plt.close()
            _maybe_plot(draw)
        return out

    # ----------------------------------------------------- gap statistic
    def gap_statistic(
        self,
        data: np.ndarray,
        version: int = 1,
        seed: int = 0,
        internal_metric_names: Optional[Sequence[str]] = None,
        plot: bool = True,
    ) -> Dict:
        """Gap = E[log W_ref] - log W_act over B uniform reference draws
        spanning the data's global scalar range (reference p2:353-410).
        `version` selects the inertia (1: mean-of-mean-pairwise; 2:
        Tibshirani sum D_r/(2 n_r))."""
        cfg = self.cfg
        names = list(internal_metric_names or cfg.internal_metrics)
        csv_path = os.path.join(self.out_path, f"gap_sts_v{version}.csv")
        data = _rows_f32(data)
        on_device = isinstance(data, jax.Array)
        fp = self._gap_fingerprint(data, version, seed, names)
        if os.path.exists(csv_path) and not cfg.overwrite:
            # reuse the previous sweep's table (reference p2:281-287) —
            # at 100k scale recomputing is minutes of k-means per re-run.
            # Unlike the reference's existence-only gate, the sidecar
            # fingerprint ties the table to the exact latents + sweep
            # config that produced it: stale or damaged tables recompute
            # instead of silently steering K selection.
            rows = self._reload_gap_csv(csv_path, fp)
            if rows is not None:
                logger.info("loading previous %s (overwrite=False)", csv_path)
                return self._gap_summary(rows, names, csv_path, plot,
                                         write_csv=False)
        inertia = inertia_v1 if version == 1 else inertia_v2
        # opt-in uniform subsample for scales where the exact O(n²)
        # inertias are impractical (Config.gap_subsample — ~5e14 FLOPs per
        # (k, draw) at 1M rows). Seeded, drawn ONCE for the whole sweep, so
        # every k / reference draw sees the same rows; the fingerprint
        # includes the subsample size, so cached tables never mix regimes.
        if cfg.gap_subsample and data.shape[0] > cfg.gap_subsample:
            logger.info(
                "gap subsample: %d of %d rows (seeded uniform)",
                cfg.gap_subsample, data.shape[0],
            )
            if on_device:
                sel = jax.random.permutation(
                    jax.random.fold_in(jax.random.PRNGKey(seed), 3),
                    data.shape[0],
                )[: cfg.gap_subsample]
                data = jnp.take(data, jnp.sort(sel), axis=0)
            else:
                sel = np.random.RandomState(seed).choice(
                    data.shape[0], cfg.gap_subsample, replace=False
                )
                data = data[np.sort(sel)]
        # invalidate-first: a crash anywhere between here and the fp write
        # at the end leaves CSV-without-fp (recompute next run) rather than
        # new-CSV-with-stale-fp (silent reuse of the wrong table).
        # Process-0-only like every artifact write: without a mesh the
        # processes free-run, and a lagging rank's remove could land AFTER
        # rank 0's fresh end-of-sweep fp write
        if is_main_process():
            try:
                os.remove(csv_path + ".fp")
            except OSError:
                pass
        lo, rng_width = float(data.min()), float(data.max() - data.min())
        data_dev = self._put_rows(data)  # after the fingerprint (hashes content)
        rng = np.random.RandomState(seed)
        rows: List[Dict] = []
        ks = list(range(2, cfg.k_max + 1))
        # Disjoint key streams via fold_in: arithmetic seed composition
        # (seed*1000 + k*17 + b) collides with the data-fit key whenever
        # k = 17k' + b, correlating a reference fit with the actual fit.
        root = jax.random.PRNGKey(seed)
        ref_stream = jax.random.fold_in(root, 0)
        data_stream = jax.random.fold_in(root, 1)
        draw_stream = jax.random.fold_in(root, 2)
        for k in ks:
            logs = []
            ref_k = jax.random.fold_in(ref_stream, k)
            draw_k = jax.random.fold_in(draw_stream, k)
            for b in range(cfg.gap_b):
                if on_device:
                    # device-resident input: draw the uniform reference
                    # cohort on device too (host RandomState would push
                    # n×d over the H2D link per draw). A DIFFERENT but
                    # equally-valid Monte-Carlo stream than the host-input
                    # path — the `act` column is identical either way (the
                    # data fits share keys); only the ref estimate's noise
                    # realization differs.
                    ref = self._put_rows(jax.random.uniform(
                        jax.random.fold_in(draw_k, b), data.shape,
                        jnp.float32, minval=lo, maxval=lo + rng_width,
                    ))
                else:
                    ref = self._put_rows(
                        rng.random_sample(data.shape).astype(np.float32)
                        * rng_width + lo
                    )
                r = kmeans_fit(
                    jax.random.fold_in(ref_k, b), ref, k, n_init=cfg.n_init
                )
                logs.append(np.log(float(inertia(ref, r.labels, k))))
            ref_mean, ref_std = float(np.mean(logs)), float(np.std(logs))
            ref_s = float(np.sqrt(1 + 1 / cfg.gap_b) * ref_std)
            r = kmeans_fit(
                jax.random.fold_in(data_stream, k), data_dev, k, n_init=cfg.n_init
            )
            act = float(np.log(float(inertia(data_dev, r.labels, k))))
            row = {
                "k": k,
                "gap": ref_mean - act,
                "ref": ref_mean,
                "act": act,
                "ref_s": ref_s,
            }
            # device_fetch: under a multi-process mesh the labels are
            # row-sharded and a plain asarray cannot address remote shards;
            # single-process device input keeps them on device (the
            # internal metrics consume them there)
            if on_device and jax.process_count() == 1:
                labels = r.labels
            else:
                labels = device_fetch(r.labels)
            row.update(compute_internal_metrics(names, data, labels, k))
            logger.info(
                "k: %d, gap: %.4f, ref: %.4f, act: %.4f, ref_s: %.4f",
                k, row["gap"], ref_mean, act, ref_s,
            )
            rows.append(row)
        out = self._gap_summary(rows, names, csv_path, plot)
        if is_main_process():
            with open(csv_path + ".fp", "w") as f:
                f.write(fp)
        return out

    def _gap_fingerprint(
        self, data: np.ndarray, version: int, seed: int, names: Sequence[str]
    ) -> str:
        """Content hash of everything that determines the gap table: the
        latents themselves plus every sweep parameter. ~0.1 s even for
        100k×256 latents — negligible next to the k-means it guards.

        Device-resident inputs hash cheap on-device reductions (per-dim
        sums + squared sums + global extrema) instead of the full bytes —
        fetching n×d floats would cost the exact D2H this input mode
        avoids, and any real change to the latents moves the moments. The
        two input modes hash differently on purpose: switching modes
        recomputes once and re-fingerprints."""
        import hashlib

        h = hashlib.blake2b(digest_size=16)
        if isinstance(data, jax.Array):
            digest = jnp.concatenate([
                jnp.sum(data, axis=0),
                jnp.sum(jnp.square(data), axis=0),
                jnp.stack([jnp.min(data), jnp.max(data)]),
            ])
            h.update(b"device-moments-v1")
            h.update(np.asarray(jax.device_get(digest)).tobytes())
        else:
            h.update(np.ascontiguousarray(data).tobytes())
        h.update(repr((data.shape, version, seed, tuple(names), self.cfg.k_max,
                       self.cfg.n_init, self.cfg.gap_b,
                       self.cfg.gap_subsample)).encode())
        return h.hexdigest()

    def _reload_gap_csv(self, csv_path: str, fp: str) -> Optional[List[Dict]]:
        """Reload iff the sidecar fingerprint matches and the table parses
        to at least one row; otherwise log why and return None (recompute)."""
        fp_path = csv_path + ".fp"
        try:
            with open(fp_path) as f:
                saved = f.read().strip()
        except OSError:
            saved = None
        if saved != fp:
            logger.warning(
                "existing %s %s the current data/config — recomputing "
                "(pass --overwrite to silence this path entirely)",
                csv_path,
                "has no fingerprint sidecar for" if saved is None
                else "does not match",
            )
            return None
        try:
            rows = _read_gap_csv(csv_path)
        except (ValueError, KeyError, OSError) as e:
            logger.warning("failed to reload %s (%s) — recomputing", csv_path, e)
            return None
        if not rows:
            logger.warning("%s is empty — recomputing", csv_path)
            return None
        return rows

    def _gap_summary(
        self,
        rows: List[Dict],
        names: Sequence[str],
        csv_path: str,
        plot: bool,
        write_csv: bool = True,
    ) -> Dict:
        """Tibshirani rule + CSV + plots over a gap table (fresh or reloaded)."""
        ks = [r["k"] for r in rows]
        # a reloaded CSV may predate a change in configured internal metrics
        names = [n for n in names if n in rows[0]]
        # Tibshirani rule: smallest k with gap(k) >= gap(k+1) - s(k+1).
        # On under-trained latents the gap can rise monotonically and the
        # rule never fires; the argmax-gap fallback still gives a usable
        # suggestion (and matches how the reference's human reads the plot).
        opt_k = None
        for i in range(len(rows) - 1):
            if rows[i]["gap"] >= rows[i + 1]["gap"] - rows[i + 1]["ref_s"]:
                opt_k = rows[i]["k"]
                break
        opt_k_argmax = max(rows, key=lambda r: r["gap"])["k"]

        if write_csv and is_main_process():
            # atomic: a process killed mid-write must not leave a partial
            # table for a later reuse to trip over
            tmp = csv_path + ".tmp"
            with open(tmp, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
                w.writeheader()
                w.writerows(rows)
            os.replace(tmp, csv_path)
        version = os.path.basename(csv_path).rsplit("_v", 1)[-1].split(".")[0]
        if plot:
            def draw(plt):
                from ..info import LEGEND_INFO

                xticks = list(range(0, self.cfg.k_max + 1, 2))
                # figure 1: gap only, with the Tibshirani reference-spread
                # error bars (the reference's gap_statistic-1 composition,
                # p2:304-309, plus the s_k bars its rule uses)
                fig, ax = plt.subplots(figsize=(12, 8))
                ax.errorbar(
                    ks, [r["gap"] for r in rows],
                    yerr=[r["ref_s"] for r in rows],
                    marker="o", capsize=4, label="gap",
                )
                ax.legend(loc="best")
                _relabel_legend(ax)
                ax.set_xlabel("Number of clusters K")
                ax.set_ylabel(LEGEND_INFO.get("gap", "gap"))
                ax.set_xticks(xticks)
                fig.savefig(
                    os.path.join(self.out_path, f"gap_statistic-1_v{version}.png"),
                    bbox_inches="tight",
                )
                plt.close(fig)
                # figure 2: gap/ref/act melted lineplot, legend outside the
                # axes (the reference's gap_statistic-2, p2:310-330)
                fig, ax = plt.subplots(figsize=(12, 8))
                markers = {"gap": "o", "ref": "s", "act": "^"}
                for key in ("gap", "ref", "act"):
                    ax.plot(ks, [r[key] for r in rows],
                            marker=markers[key], label=key)
                ax.legend(loc=2, ncol=1, borderaxespad=0.0,
                          bbox_to_anchor=(1.02, 1))
                leg = _relabel_legend(ax)
                ax.set_xlabel("Number of clusters K")
                ax.set_ylabel(LEGEND_INFO.get("log(inertia)", "log(inertia)"))
                ax.set_xticks(xticks)
                fig.savefig(
                    os.path.join(self.out_path, f"gap_statistic-2_v{version}.png"),
                    bbox_extra_artists=(leg,) if leg else None,
                    bbox_inches="tight",
                )
                plt.close(fig)
                # per-K internal validity metrics, one panel per metric
                if names:
                    fig, axes = plt.subplots(
                        1, len(names), figsize=(6 * len(names), 5), squeeze=False
                    )
                    for ax, name in zip(axes[0], names):
                        ax.plot(ks, [r[name] for r in rows], marker="o")
                        ax.set_xlabel("Number of clusters K")
                        ax.set_ylabel(name)
                    fig.tight_layout()
                    fig.savefig(
                        os.path.join(self.out_path, f"internal_metrics_v{version}.png")
                    )
                    plt.close(fig)
            _maybe_plot(draw)
        return {
            "rows": rows,
            "opt_k": opt_k,
            "opt_k_argmax": opt_k_argmax,
            "csv": csv_path,
        }

    def select_opt_k(
        self, train_feat: np.ndarray, valid_feat: np.ndarray, seed: int = 0
    ) -> Dict:
        """Dispatch over the configured methods (reference Cluster.select_opt_k)."""
        out = {}
        for method in self.cfg.select_opt_k:
            if method == "elbow":
                out["elbow"] = self.elbow(train_feat, valid_feat, seed)
            elif method == "gap_sts":
                out["gap_sts"] = self.gap_statistic(train_feat, version=1, seed=seed)
            else:
                raise ValueError(f"unknown K-selection method {method!r}")
        return out


# --------------------------------------------------- density explorers
def _derive_min_samples(explicit: Optional[int], feat: np.ndarray) -> int:
    """None -> feat_dim + 1, the reference's choice for both density
    explorers (p2_clustering_optK.py:84,87: min_samples=self.feat_dim+1)."""
    return explicit if explicit else feat.shape[-1] + 1


def dbscan_quality(feat: np.ndarray, labels: np.ndarray) -> Dict:
    """Cluster-quality summary for DBSCAN labels: cluster/noise counts plus
    silhouette with and without the noise points — the pair the reference
    logs both in the p2 eps sweep (p2_clustering_optK.py:148-166) and for
    the final p4 dbscan labels (p4_clustering_final.py:209-233). Noise
    (-1) counts as its own cluster in the with-noise score, exactly as
    sklearn's silhouette treats it. Scores run as the blocked on-device
    sweep (cluster/metrics.silhouette_score, sklearn-oracle-tested) — the
    host sklearn pass is O(n²d) CPU at the 100k scale the on-device
    DBSCAN fit just made cheap."""
    labels = np.asarray(labels)
    n_clusters = len(set(labels.tolist())) - (1 if -1 in labels else 0)
    n_noise = int(np.sum(labels == -1))
    row: Dict = {"n_clusters": n_clusters, "n_noise": n_noise}
    mask = labels != -1
    if n_clusters >= 2:
        row["silhouette_with_noise"] = _device_silhouette(feat, labels)
        if mask.sum() and len(set(labels[mask].tolist())) >= 2:
            row["silhouette_wo_noise"] = _device_silhouette(
                feat[mask], labels[mask]
            )
    return row


def _device_silhouette(feat: np.ndarray, labels: np.ndarray) -> float:
    """Blocked on-device silhouette over arbitrary (possibly sparse, -1
    included) label values: densify, score."""
    import jax.numpy as jnp

    from .metrics import silhouette_score

    uniq, dense = np.unique(np.asarray(labels), return_inverse=True)
    return float(
        silhouette_score(
            jnp.asarray(feat, jnp.float32), jnp.asarray(dense), int(len(uniq))
        )
    )


class DbscanExplorer:
    """k-distance graph + eps sweep (reference `Dbscan`, p2:90-168).
    Host-side sklearn; the eps knee uses our Kneedle."""

    def __init__(self, cfg: Config, out_path: str, min_samples: Optional[int] = None):
        self.cfg = cfg
        self.min_samples = min_samples  # None -> feat_dim + 1 per fit
        self.out_path = os.path.join(out_path, "plot")
        os.makedirs(self.out_path, exist_ok=True)

    def _min_samples(self, feat: np.ndarray) -> int:
        return _derive_min_samples(self.min_samples, feat)

    def k_distance_graph(self, feat: np.ndarray, plot: bool = True) -> Dict:
        from .metrics import kth_neighbor_distance

        k = self._min_samples(feat) - 1
        # the reference's sklearn kneighbors(k) columns are [self, nn1, ...,
        # nn_{k-1}], so its dist[:, -1] is the (k-1)-th TRUE neighbor; the
        # device sweep excludes self, hence k - 1 (p2:97-107 semantics)
        if k - 1 > len(feat) - 1:
            # min_samples = feat_dim + 1 exceeds the cohort: the reference's
            # sklearn path hard-crashes here ("n_neighbors <= n_samples");
            # clamp to the farthest existing neighbor and keep exploring
            logger.warning(
                "k-distance: %d neighbors requested but only %d rows; "
                "clamping to %d", k - 1, len(feat), len(feat) - 1,
            )
            k = len(feat)
        if k <= 1:
            kth = np.zeros(len(feat), np.float32)  # degenerate: self column
        else:
            kth = np.asarray(
                kth_neighbor_distance(np.asarray(feat, np.float32), k - 1)
            )
        kth = np.sort(kth)
        idx = np.arange(len(kth))
        knee_x = kneedle(idx, kth, curve="convex", direction="increasing")
        knee_eps = float(kth[int(knee_x)]) if knee_x is not None else None
        if plot:
            def draw(plt):
                plt.figure()
                plt.plot(idx, kth)
                plt.xlabel("Points sorted by distance")
                plt.ylabel(f"{k}-NN distance")
                plt.savefig(os.path.join(self.out_path, "k_distance_graph.png"))
                plt.close()
            _maybe_plot(draw)
        return {"kth_distances": kth, "knee_eps": knee_eps}

    def eps_sweep(
        self, feat: np.ndarray, eps_values: Optional[Sequence[float]] = None
    ) -> List[Dict]:
        from .dbscan import fit_dbscan_impl

        if eps_values is None:
            eps_values = np.arange(0.5, 5.0, 0.5)
        rows = []
        for eps in eps_values:
            labels, _ = fit_dbscan_impl(
                self.cfg, feat, float(eps), self._min_samples(feat)
            )
            row = {"eps": float(eps)}
            row.update(dbscan_quality(feat, labels))
            rows.append(row)
            logger.info("dbscan eps sweep: %s", row)
        return rows


class OpticsExplorer:
    """OPTICS reachability exploration (reference `Optics`, p2:171-223)."""

    def __init__(self, cfg: Config, out_path: str, min_samples: Optional[int] = None):
        self.cfg = cfg
        self.min_samples = min_samples  # None -> feat_dim + 1 per fit
        self.out_path = os.path.join(out_path, "plot")
        os.makedirs(self.out_path, exist_ok=True)

    def _min_samples(self, feat: np.ndarray) -> int:
        return _derive_min_samples(self.min_samples, feat)

    def run(self, feat: np.ndarray, method: str = "xi", plot: bool = True) -> Dict:
        from sklearn.cluster import OPTICS

        kwargs = (
            {"cluster_method": "xi", "xi": 0.05}
            if method == "xi"
            else {"cluster_method": "dbscan", "eps": self.cfg.opt_eps}
        )
        model = OPTICS(min_samples=self._min_samples(feat), **kwargs).fit(feat)
        reach = model.reachability_[model.ordering_]
        if plot:
            def draw(plt):
                plt.figure()
                plt.plot(np.arange(len(reach)), reach)
                plt.ylabel("Reachability distance")
                plt.savefig(os.path.join(self.out_path, "optics_reachability.png"))
                plt.close()
            _maybe_plot(draw)
        return {"labels": model.labels_, "reachability": reach}
