"""Shared CLI plumbing: Config-driven argparse, run directories, data io.

The reference duplicates ~35 argparse flags across four entry scripts
(p1_pretrain_main.py:18-101, p3_clustering_main.py:17-105, p2:29-42,
p4:30-40). Here the flag surface is generated from the `Config` dataclass —
every field becomes `--<name>`; dict/tuple-valued fields take JSON — so the
CLI can never drift from the config. `--config <path>` reloads a previous
run's JSON with CLI overrides winning (reference utils.py:44-57).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pickle
from typing import Dict, Optional

import numpy as np

from ..config import Config
from ..data import ArrayDataset
from ..info import COHORTS
from ..utils import logger, set_seed


def build_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", default=None, help="path to a saved config.json")
    for f in dataclasses.fields(Config):
        flag = f"--{f.name}"
        default = f.default if f.default is not dataclasses.MISSING else None
        if f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
            default = f.default_factory()  # type: ignore[misc]
        if f.type in ("bool", bool) or isinstance(default, bool):
            p.add_argument(flag, type=_str2bool, default=None, metavar="BOOL")
        elif isinstance(default, int):
            p.add_argument(flag, type=int, default=None)
        elif isinstance(default, float):
            p.add_argument(flag, type=float, default=None)
        elif isinstance(default, (dict, tuple, list)):
            p.add_argument(flag, type=str, default=None, help="JSON value")
        else:
            p.add_argument(flag, type=str, default=None)
    return p


def _str2bool(v: str) -> bool:
    s = str(v).lower()
    if s in ("1", "true", "yes", "y"):
        return True
    if s in ("0", "false", "no", "n"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def config_from_args(args: argparse.Namespace) -> Config:
    overrides = {}
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name, None)
        if v is None:
            continue
        if isinstance(f.default, (dict, tuple)) or (
            f.default_factory is not dataclasses.MISSING  # type: ignore[misc]
        ):
            v = json.loads(v)
            if isinstance(f.default, tuple):
                v = tuple(v)
        overrides[f.name] = v
    if args.config:
        return Config.load(args.config, **overrides)
    return Config(**overrides)


# ------------------------------------------------------------- data io
def processed_dir(cfg: Config) -> str:
    return os.path.join(cfg.base_path, "model_data", "split_processed")


def save_processed(cfg: Config, splits: Dict[str, Dict[str, np.ndarray]]) -> None:
    d = processed_dir(cfg)
    os.makedirs(d, exist_ok=True)
    for cohort, data in splits.items():
        path = os.path.join(d, f"{cohort}.pickle")
        with open(path, "wb") as f:
            pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)
        logger.info("wrote %s (%d encounters)", path, len(data["encounter_id"]))


# -------------------------------------------------- p0 cache fingerprint
# The reference caches p0 intermediates and skips rewriting
# split_processed/{cohort}.pickle when present (p0_data_process.py:172-185,
# 200-204) — an existence-only gate that silently serves stale data after
# an input/config change. Here the skip is tied to a content fingerprint of
# everything that determines the output (the optk.py gap-CSV pattern):
# raw input file bytes (or the synthetic generator's parameters) plus the
# preprocessing config. Sidecar `p0.fp` lives next to the pickles;
# invalidate-first ordering means a crash mid-write recomputes next run.
def _p0_fp_path(cfg: Config) -> str:
    return os.path.join(processed_dir(cfg), "p0.fp")


def p0_fingerprint(cfg: Config, source_items) -> str:
    """Content hash of the p0 inputs. `source_items` is a list of either
    file paths (raw mode: bytes are hashed) or repr-able values (synthetic
    mode: generator parameters)."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for item in source_items:
        if isinstance(item, str) and os.path.isfile(item):
            with open(item, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 22), b""):
                    h.update(chunk)
        else:
            h.update(repr(item).encode())
    h.update(repr((cfg.seed, cfg.holdout_frac, cfg.norm_method,
                   cfg.hours_from_admission)).encode())
    return h.hexdigest()


def p0_cache_valid(cfg: Config, fp: str, extra_outputs=()) -> bool:
    """True iff every cohort pickle (plus any `extra_outputs` the mode also
    writes, e.g. raw mode's abnormal-vital aux CSV) exists and the sidecar
    matches `fp` — a cache hit must vouch for EVERY p0 artifact, not just
    the pickles."""
    d = processed_dir(cfg)
    if not all(
        os.path.exists(os.path.join(d, f"{c}.pickle")) for c in COHORTS
    ):
        return False
    for path in extra_outputs:
        if not os.path.exists(path):
            logger.warning(
                "p0 pickles exist but %s is missing — recomputing", path
            )
            return False
    try:
        with open(_p0_fp_path(cfg)) as f:
            saved = f.read().strip()
    except OSError:
        logger.warning(
            "existing %s/*.pickle have no p0.fp sidecar — recomputing "
            "(pass --overwrite true to always recompute)", d,
        )
        return False
    if saved != fp:
        logger.warning(
            "existing %s/*.pickle were built from different inputs/config "
            "— recomputing", d,
        )
        return False
    return True


def p0_invalidate(cfg: Config) -> None:
    try:
        os.remove(_p0_fp_path(cfg))
    except OSError:
        pass


def p0_write_fp(cfg: Config, fp: str) -> None:
    with open(_p0_fp_path(cfg), "w") as f:
        f.write(fp)


# ---- raw-slice intermediate cache (reference split_org/,
# p0_data_process.py:172-185): the gridded per-cohort slices + aux joins
# depend only on the sources and the admission window — NOT on
# holdout_frac / norm_method / the hold-out RNG — so a preprocessing-knob
# re-run restores them in seconds instead of re-gridding the raw data.
def _p0_raw_dir(cfg: Config) -> str:
    return os.path.join(cfg.base_path, "model_data", "split_org")


def _p0_raw_fp_path(cfg: Config) -> str:
    return os.path.join(_p0_raw_dir(cfg), "p0_raw.fp")


def p0_raw_fingerprint(cfg: Config, source_items) -> str:
    """Raw-stage content hash: sources + hours_from_admission only (the
    synthetic caller appends its seed to `source_items` — the generator
    draws from it; raw-file gridding is seed-free)."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for item in source_items:
        if isinstance(item, str) and os.path.isfile(item):
            with open(item, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 22), b""):
                    h.update(chunk)
        else:
            h.update(repr(item).encode())
    h.update(repr(("raw-v1", cfg.hours_from_admission)).encode())
    return h.hexdigest()


def p0_raw_cache_valid(cfg: Config, fp: str, extra_outputs=()) -> bool:
    """True iff every cohort raw-slice pickle (plus `extra_outputs` built
    from the same raw stage, e.g. the abnormal-vital aux CSV) exists and
    the sidecar matches `fp` (same invalidate-first discipline as the
    processed cache)."""
    d = _p0_raw_dir(cfg)
    if not all(
        os.path.exists(os.path.join(d, f"{c}.pickle")) for c in COHORTS
    ):
        return False
    for path in extra_outputs:
        if not os.path.exists(path):
            return False
    try:
        with open(_p0_raw_fp_path(cfg)) as f:
            return f.read().strip() == fp
    except OSError:
        return False


def p0_load_raw(cfg: Config) -> Dict[str, Dict[str, np.ndarray]]:
    d = _p0_raw_dir(cfg)
    out = {}
    for cohort in COHORTS:
        with open(os.path.join(d, f"{cohort}.pickle"), "rb") as f:
            out[cohort] = pickle.load(f)
    return out


def p0_save_raw(cfg: Config, splits, fp: str) -> None:
    """Write the raw slices + sidecar. Invalidate-first: a crash between
    pickle and fp writes leaves pickles-without-fp (recompute next run),
    never fresh-fp-over-stale-pickles."""
    d = _p0_raw_dir(cfg)
    os.makedirs(d, exist_ok=True)
    try:
        os.remove(_p0_raw_fp_path(cfg))
    except OSError:
        pass
    for cohort, data in splits.items():
        with open(os.path.join(d, f"{cohort}.pickle"), "wb") as f:
            pickle.dump(data, f)
    with open(_p0_raw_fp_path(cfg), "w") as f:
        f.write(fp)
    logger.info("p0: cached raw slices in %s", d)


def load_processed(cfg: Config) -> Dict[str, Dict[str, np.ndarray]]:
    d = processed_dir(cfg)
    out = {}
    for cohort in COHORTS:
        with open(os.path.join(d, f"{cohort}.pickle"), "rb") as f:
            out[cohort] = pickle.load(f)
    return out


def make_datasets(cfg: Config) -> Dict[str, ArrayDataset]:
    splits = load_processed(cfg)
    return {c: ArrayDataset(cfg, d, c) for c, d in splits.items()}


def init_run(cfg: Config, stage: str) -> str:
    init_multihost(cfg)
    set_seed(cfg.seed)
    enable_compilation_cache(cfg)
    exp_path = os.path.join(cfg.results_path, stage)
    os.makedirs(exp_path, exist_ok=True)
    from ..parallel import is_main_process

    if is_main_process():
        cfg.save(exp_path)
    logger.info("run dir: %s", exp_path)
    return exp_path


def init_multihost(cfg: Config) -> None:
    """`jax.distributed` setup when the multi-process flags are set; must
    run before the first device use (init_run does). `num_processes>0`
    with an empty coordinator address uses TPU-pod auto-discovery."""
    if cfg.num_processes <= 0:
        return
    from ..parallel import multihost

    multihost.initialize(
        cfg.coordinator_address or None, cfg.num_processes, cfg.process_id
    )
    import jax

    logger.info(
        "multihost: process %d/%d, %d global / %d local devices",
        jax.process_index(), jax.process_count(),
        len(jax.devices()), len(jax.local_devices()),
    )


def enable_compilation_cache(cfg: Config) -> None:
    """Point XLA's persistent compilation cache at `cfg.compilation_cache_dir`
    so repeated CLI runs of the same config skip the cold jit compiles.
    No-ops if disabled or if the user already configured a cache (env var
    JAX_COMPILATION_CACHE_DIR or jax.config)."""
    if not cfg.compilation_cache_dir:
        return
    import jax

    if jax.config.jax_compilation_cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR"
    ):
        return
    path = os.path.expanduser(cfg.compilation_cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
