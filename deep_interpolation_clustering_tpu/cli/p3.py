"""p3 — DEC joint fine-tuning CLI.

Mirrors `python p3_clustering_main.py` (p3_clustering_main.py:107-147):
k-means center init from the p1 latents, joint training with the KL loss
and delta-label stopping, then feature dumps for all three monitored
metrics x cohorts.
"""

from __future__ import annotations

import os

from ..info import COHORTS, METRICS
from ..train import ClusterTrainer
from ..utils import logger
from .common import build_parser, config_from_args, init_run, make_datasets


def main(argv=None):
    parser = build_parser(__doc__)
    parser.add_argument("--pretrain_path", default=None,
                        help="p1 run dir (default {results_path}/Pretrain)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    if args.loss is None and not args.config:
        cfg = cfg.replace(loss="ae_mse_sup_fake_detect_kl")  # p3 default (p3:82)
    exp_path = init_run(cfg, "Clustering")
    pretrain_path = args.pretrain_path or os.path.join(cfg.results_path, "Pretrain")

    datasets = make_datasets(cfg)
    trainer = ClusterTrainer(cfg, datasets, exp_path, pretrain_exp_path=pretrain_path)
    try:
        if cfg.mode == "train":
            trainer.train()
        for metric in METRICS:  # reference p3:140-143 dumps all three
            for cohort in COHORTS:
                trainer.eval(cohort, generate_feat=True, viz_feat=True, metric=metric)
    finally:
        trainer.close()
    logger.info("p3 done: %s", exp_path)


if __name__ == "__main__":
    main()
