"""p4 — final cluster labels CLI.

Mirrors `python p4_clustering_final.py` (p4_clustering_final.py:141-309):
fit/align/relabel every cohort with the configured method and write
`{cohort}_{K}.npy` dumps carrying `cluster_id`.
"""

from __future__ import annotations

import os

from ..cluster import FinalLabeler
from ..utils import logger
from .common import (
    build_parser,
    config_from_args,
    enable_compilation_cache,
    init_multihost,
)


def main(argv=None):
    parser = build_parser(__doc__)
    parser.add_argument("--stage", default="Clustering", choices=["Pretrain", "Clustering"])
    parser.add_argument("--restore_metrics", nargs="+", default=["ae_mse", "loss", "delta"])
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    init_multihost(cfg)
    enable_compilation_cache(cfg)
    exp_path = os.path.join(cfg.results_path, args.stage)

    results = FinalLabeler(cfg, exp_path).pred(metrics=args.restore_metrics, seed=cfg.seed)
    for metric, cohorts in results.items():
        for cohort, labels in cohorts.items():
            logger.info("[%s] %s: %d samples, %d clusters",
                        metric, cohort, len(labels), len(set(labels.tolist()) - {-1}))
    logger.info("p4 done")


if __name__ == "__main__":
    main()
