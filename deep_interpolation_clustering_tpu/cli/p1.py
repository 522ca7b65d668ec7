"""p1 — interpolation-autoencoder pretraining CLI.

Mirrors `python p1_pretrain_main.py` (p1_pretrain_main.py:103-151): build
the model + cohort datasets, train with per-metric best checkpoints and
early stopping, then dump per-encounter features for
metrics ['loss','ae_mse'] x all three cohorts.
"""

from __future__ import annotations

from ..train import Trainer
from ..info import COHORTS
from ..utils import logger
from .common import build_parser, config_from_args, init_run, make_datasets

PRETRAIN_FEAT_METRICS = ("loss", "ae_mse")  # reference p1:143


def main(argv=None):
    parser = build_parser(__doc__)
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    exp_path = init_run(cfg, "Pretrain")

    datasets = make_datasets(cfg)
    trainer = Trainer(cfg, datasets, exp_path)
    try:
        if cfg.mode == "train":
            trainer.train()
        # feature dumps for every restore metric x cohort (reference p1:143-146)
        for metric in PRETRAIN_FEAT_METRICS:
            for cohort in COHORTS:
                trainer.eval(cohort, generate_feat=True, viz_feat=True, metric=metric)
    finally:
        trainer.close()
    logger.info("p1 done: %s", exp_path)


if __name__ == "__main__":
    main()
