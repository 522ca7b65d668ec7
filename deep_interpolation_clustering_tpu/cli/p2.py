"""p2 — optimal-K selection CLI.

Mirrors `python p2_clustering_optK.py` (p2_clustering_optK.py:45-88,
413-420): load the latent dumps for each restore metric and run the
configured K-selection methods (elbow + gap statistic on-device; DBSCAN /
OPTICS explorers host-side).
"""

from __future__ import annotations

import os

from ..cluster import DbscanExplorer, KSelection, OpticsExplorer, load_feature_dumps
from ..parallel import make_mesh
from ..utils import logger
from .common import (
    build_parser,
    config_from_args,
    enable_compilation_cache,
    init_multihost,
)


def main(argv=None):
    parser = build_parser(__doc__)
    parser.add_argument("--stage", default="Pretrain", choices=["Pretrain", "Clustering"])
    parser.add_argument("--restore_metrics", nargs="+", default=["ae_mse", "loss"])
    parser.add_argument("--cluster_algo", default="kmeans",
                        choices=["kmeans", "dbscan", "optics"])
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    # multihost must initialize before first device use (the analytics
    # COMPUTE runs on every process; only writes are process-0-only)
    init_multihost(cfg)
    enable_compilation_cache(cfg)
    exp_path = os.path.join(cfg.results_path, args.stage)
    # same data_parallel semantics as the trainers: the mesh row-shards the
    # latents so the K-sweep's k-means fits run data-parallel (KSelection)
    mesh = make_mesh(max(cfg.data_parallel, 0)) if cfg.data_parallel else None

    for metric in args.restore_metrics:
        feat_path = os.path.join(exp_path, "out_feat", metric)
        data = load_feature_dumps(feat_path)
        out_path = os.path.join(exp_path, "opt_k", metric)
        train_h = data["training"]["hidden"]
        valid_h = data["validation"]["hidden"]
        if args.cluster_algo == "kmeans":
            out = KSelection(cfg, out_path, mesh=mesh).select_opt_k(
                train_h, valid_h, seed=cfg.seed
            )
            for method, r in out.items():
                logger.info(
                    "[%s] %s -> %s", metric, method,
                    {k: v for k, v in r.items()
                     if k.startswith("opt_k") or k.startswith("elbow")},
                )
        elif args.cluster_algo == "dbscan":
            ex = DbscanExplorer(cfg, out_path)
            kd = ex.k_distance_graph(train_h)
            logger.info("[%s] dbscan knee eps: %s", metric, kd["knee_eps"])
            ex.eps_sweep(train_h)
        else:
            OpticsExplorer(cfg, out_path).run(train_h)
    logger.info("p2 done")


if __name__ == "__main__":
    main()
