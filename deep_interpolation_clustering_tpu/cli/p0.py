"""p0 — offline data preprocessing CLI.

Mirrors the reference entry `python p0_data_process.py` (p0_data_process.py:
135-204): grid raw per-vital long-format data into dense planes, mean-impute
empty channels with training means, hold out 20% of observations for the
denoising-AE loss, and min-max normalize — then write
`{base_path}/model_data/split_processed/{cohort}.pickle`.

Two sources:
  * `--raw_dir DIR` — a directory with `encounter.csv`, `vitals.pickle`
    (dict vital -> long dataframe), `split_ids.pickle` (cohort -> id list),
    the reference's private-cohort format.
  * `--synthetic N` — the built-in synthetic cohort generator, so the whole
    p0→p4 pipeline runs anywhere (BASELINE.json configs[0]).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from ..data import generate_data, make_synthetic_cohorts, process_splits
from ..data.abnormal import extract_abnormal_vitals
from ..info import COHORTS
from ..utils import logger, set_seed
from .common import (
    build_parser,
    config_from_args,
    p0_cache_valid,
    p0_fingerprint,
    p0_invalidate,
    p0_load_raw,
    p0_raw_cache_valid,
    p0_raw_fingerprint,
    p0_save_raw,
    p0_write_fp,
    save_processed,
)


def main(argv=None):
    parser = build_parser(__doc__)
    parser.add_argument("--raw_dir", default=None)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--synthetic_max_obs", type=int, default=48)
    parser.add_argument("--synthetic_phenotypes", type=int, default=4)
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    # p0 is host-side preprocessing with no device work: under a multi-host
    # launch only ONE rank may write the pickles (concurrent writers on a
    # shared filesystem tear them), and there are no collectives to need
    # jax.distributed — gate on the explicit rank flag instead
    if cfg.num_processes > 1:
        if cfg.process_id < 0:
            parser.error(
                "p0 with --num_processes > 1 needs an explicit --process_id "
                "(it is host-side preprocessing: rank 0 writes, others skip; "
                "simplest is to run p0 once on one host before the launch)"
            )
        if cfg.process_id != 0:
            logger.info(
                "p0: process %d skipping (rank 0 writes the pickles)",
                cfg.process_id,
            )
            return
    set_seed(cfg.seed)
    rng = np.random.RandomState(cfg.seed)

    # skip-if-cached (reference p0_data_process.py:200-204, but gated on a
    # content fingerprint of the inputs instead of bare existence): at the
    # builder's measured scale a p0 re-run is 125 s (100k) / 293 s (1M) of
    # host work — a matching cache makes it ~instant
    if args.synthetic:
        sources = [("synthetic", args.synthetic, args.synthetic_max_obs,
                    args.synthetic_phenotypes)]
    elif args.raw_dir:
        sources = [os.path.join(args.raw_dir, n)
                   for n in ("encounter.csv", "vitals.pickle", "split_ids.pickle")]
    else:
        parser.error("one of --raw_dir or --synthetic is required")
    fp = p0_fingerprint(cfg, sources)
    # raw mode also writes the aux CSV; a cache hit must vouch for it too
    extra_outputs = (
        [os.path.join(cfg.base_path, "next_hour_abnormal_norm_val.csv")]
        if args.raw_dir else []
    )
    if not cfg.overwrite and p0_cache_valid(cfg, fp, extra_outputs):
        logger.info(
            "p0: split_processed pickles match the current inputs/config — "
            "skipping recompute (pass --overwrite true to force)"
        )
        return
    p0_invalidate(cfg)

    # intermediate raw-slice cache (reference split_org/, p0:172-185): the
    # gridded slices + aux joins depend only on sources + hours, so a
    # holdout_frac/norm_method/seed change re-runs from here in seconds
    # instead of re-gridding (125 s at 100k / 293 s at 1M, measured)
    raw_sources = list(sources) + ([("seed", cfg.seed)] if args.synthetic else [])
    raw_fp = p0_raw_fingerprint(cfg, raw_sources)
    splits = None
    if not cfg.overwrite and p0_raw_cache_valid(cfg, raw_fp, extra_outputs):
        logger.info(
            "p0: split_org raw slices match the current sources — skipping "
            "the gridding stage"
        )
        splits = p0_load_raw(cfg)

    from_raw_cache = splits is not None
    if from_raw_cache:
        pass
    elif args.synthetic:
        splits = make_synthetic_cohorts(
            n_total=args.synthetic,
            hours=cfg.hours_from_admission,
            max_obs=args.synthetic_max_obs,
            n_phenotypes=args.synthetic_phenotypes,
            seed=cfg.seed,
        )
    elif args.raw_dir:
        import pandas as pd

        encounter = pd.read_csv(os.path.join(args.raw_dir, "encounter.csv"))
        with open(os.path.join(args.raw_dir, "vitals.pickle"), "rb") as f:
            vital_data = pickle.load(f)
        with open(os.path.join(args.raw_dir, "split_ids.pickle"), "rb") as f:
            split_ids = pickle.load(f)
        # restrict to the first `hours` like the reference (p0:27-28)
        vital_data = {
            k: df[df["time_stamp"] <= cfg.hours_from_admission]
            for k, df in vital_data.items()
        }
        splits = {}
        for cohort in COHORTS:
            splits[cohort] = generate_data(split_ids[cohort], vital_data)
        # hour-(h+1) abnormal-vital aux targets (get_abnormal_vital.py:55-78)
        with open(os.path.join(args.raw_dir, "vitals.pickle"), "rb") as f:
            vital_24h = pickle.load(f)
        aux = extract_abnormal_vitals(vital_24h, encounter, cfg.hours_from_admission)
        aux_path = os.path.join(cfg.base_path, "next_hour_abnormal_norm_val.csv")
        os.makedirs(cfg.base_path, exist_ok=True)
        aux.to_csv(aux_path, index=False)
        logger.info("wrote %s", aux_path)
        # attach per-cohort future-vital arrays
        aux = aux.set_index("encounter_deiden_id")
        from ..info import USE_FEATURES

        # binary outcome labels ride along from the encounter table when
        # present (reference dataloader.py:81-113 joins outcome CSVs)
        outcome_cols = [
            c for c in ("AKI_overall", "mort_status_30d", "ICU")
            if c in encounter.columns
        ]
        enc_idx = encounter.set_index("encounter_deiden_id")
        for cohort in COHORTS:
            ids = splits[cohort]["encounter_id"]
            fv = np.full((len(ids), len(USE_FEATURES)), np.nan)
            present = [i for i, e in enumerate(ids) if e in aux.index]
            fv[present] = aux.loc[[ids[i] for i in present], list(USE_FEATURES)].values
            splits[cohort]["future_vital"] = fv
            for col in outcome_cols:
                splits[cohort][col] = (
                    enc_idx[col].reindex(ids).fillna(0).to_numpy(np.float32)
                )
    if not from_raw_cache:
        p0_save_raw(cfg, splits, raw_fp)
    process_splits(splits, holdout_frac=cfg.holdout_frac, rng=rng,
                   norm_method=cfg.norm_method)
    save_processed(cfg, splits)
    p0_write_fp(cfg, fp)


if __name__ == "__main__":
    main()
