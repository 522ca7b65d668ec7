"""Online data loading: dense arrays + a shuffled batch iterator.

TPU-first redesign of the reference's torch `DataSet`/`DataLoader` worker
pool (dataloader.py:16-217): cohorts are dense front-packed arrays resident
in host memory; batches are sliced views; and the per-sample randomized work
— adversarial fake-sample generation and Gaussian augmentation — moves into
jittable functions of `(batch, key)` that run **inside** the training step on
device, so the input pipeline is never the bottleneck and every batch is
reproducible from the epoch key.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.pallas_select import fake_select_mask
from ..utils import logger

Array = jax.Array


class ArrayDataset:
    """A cohort as dense arrays, pre-scaled once at construction.

    The observation plane is affinely scaled `x -> scale*x - scale/2`
    mapping [0,1] to [-scale/2, scale/2] (reference dataloader.py:74-79).
    Auxiliary labels (future-vital targets with NaN->mask, binary outcomes)
    ride along as aligned arrays (reference dataloader.py:81-118).
    """

    def __init__(self, cfg: Config, cohort_dict: Dict[str, np.ndarray], cohort: str):
        self.cfg = cfg
        self.cohort = cohort
        self.encounter_ids = list(cohort_dict["encounter_id"])

        feat = np.asarray(cohort_dict["feat"], np.float32)
        if cfg.scale != 0:
            feat = cfg.scale * feat - cfg.scale / 2
        self.ob = feat
        self.padding_mask = np.asarray(cohort_dict["padding_mask"], np.float32)
        self.timestamp = np.asarray(cohort_dict["time_step"], np.float32)
        self.ae_mask = np.asarray(cohort_dict["drop_mask"], np.float32)

        self.aux: Dict[str, np.ndarray] = {}
        if "future_vital" in cfg.aux_tasks:
            fv = np.asarray(cohort_dict["future_vital"], np.float32)
            self.aux["future_vital_mask"] = (~np.isnan(fv)).astype(np.float32)
            self.aux["future_vital"] = np.nan_to_num(fv, nan=0.0)
        for task in cfg.aux_tasks:
            if task == "future_vital":
                continue
            self.aux[task] = np.asarray(cohort_dict[task], np.float32)

        logger.info("%s data shape: %s", cohort, self.ob.shape)

    def __len__(self) -> int:
        return self.ob.shape[0]

    @property
    def num_timestamps(self) -> int:
        return self.ob.shape[-1]

    def batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        d = {
            "index": idx,
            "ob": self.ob[idx],
            "padding_mask": self.padding_mask[idx],
            "timestamp": self.timestamp[idx],
            "ae_mask": self.ae_mask[idx],
        }
        for k, v in self.aux.items():
            d[k] = v[idx]
        return d

    def iter_batches(
        self,
        batch_size: int,
        shuffle: bool = False,
        rng: Optional[np.random.RandomState] = None,
        drop_last: bool = False,
    ) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self)
        order = np.arange(n)
        if shuffle:
            (rng or np.random).shuffle(order)
        stop = (n // batch_size) * batch_size if drop_last else n
        for start in range(0, stop, batch_size):
            yield self.batch(order[start : start + batch_size])

    def num_batches(self, batch_size: int, drop_last: bool = False) -> int:
        n = len(self)
        return n // batch_size if drop_last else -(-n // batch_size)

    def arrays(self) -> Dict[str, np.ndarray]:
        """All cohort planes + aux labels as one dict — the payload uploaded
        once for device-resident (HBM) batching."""
        d = {
            "ob": self.ob,
            "padding_mask": self.padding_mask,
            "timestamp": self.timestamp,
            "ae_mask": self.ae_mask,
        }
        d.update(self.aux)
        return d


# ------------------------------------------------------------------
# device-side randomized transforms (jittable)
# ------------------------------------------------------------------
def make_fake_ob(
    ob: Array, padding_mask: Array, key: Array, scale: float,
    draw_bits: int = 32,
) -> Array:
    """Adversarial negatives: replace a random 50% (>=1) of each channel's
    valid observations with uniform noise over the scaled input range
    (reference dataloader.py:182-193).

    Valid observations occupy the first `n_valid` slots (front-packed
    gridding), so selecting the k smallest of per-slot random keys draws an
    exact uniform k-subset without replacement — the vectorized equivalent
    of the reference's per-channel `np.random.choice`. The selection runs
    through `ops.pallas_select.fake_select_mask`: a fused VMEM-resident
    radix select on TPU (the previous in-step `(B, C, T)` score sort was
    ~18% of the whole fused train step), bit-identical sort-based XLA
    elsewhere.

    Channels with zero valid observations select nothing — their "fake"
    row equals the real one. The p0 pipeline never produces such channels
    (mean_imputation guarantees >=1 observation), but the contract is
    explicit.

    `draw_bits=16` (Config.rng_draw_bits) halves the threefry work of the
    two (B, C, T) draws: 16 random key bits pick a k-subset that is
    uniform except when the random parts tie across the k-th/(k+1)-th
    boundary, where the earlier slot deterministically wins — an
    early-position bias in ~T/2^16 of rows (~0.5% at T=354; the 32-bit
    path's 21 random bits make the same bias ~32x rarer, see
    ops/pallas_select.py). Irrelevant for adversarial fake generation but
    stated: the reference's np.random.choice is exactly uniform. The
    noise keeps 10-bit-mantissa resolution over the scaled range. Changes
    the drawn stream, none of the cross-path contracts (same fn on every
    path/backend). Measured wall-neutral on the chip — see the
    Config.rng_draw_bits comment.
    """
    b, c, t = ob.shape
    k_sel, k_noise = jax.random.split(key)
    n_valid = jnp.sum(padding_mask, axis=2).astype(jnp.int32)  # (B, C)
    num_perm = jnp.where(n_valid > 0, jnp.maximum(1, n_valid // 2), 0)

    if draw_bits == 16:
        bits = jax.random.bits(k_sel, (b, c, t), dtype=jnp.uint16)
        bits = bits.astype(jnp.uint32) << 16
        noise = jax.random.uniform(
            k_noise, (b, c, t), dtype=jnp.float16
        ).astype(jnp.float32)
    else:
        bits = jax.random.bits(k_sel, (b, c, t), dtype=jnp.uint32)
        noise = jax.random.uniform(k_noise, (b, c, t))
    selected = fake_select_mask(bits, n_valid, num_perm)
    if scale != 0:
        noise = noise * scale - scale / 2
    return jnp.where(selected, noise, ob)


def augment_batch(
    ob: Array, timestamp: Array, padding_mask: Array, key: Array, ob_std: float,
    draw_bits: int = 32,
) -> tuple:
    """Gaussian train-time augmentation on observations (std=`ob_std`) and
    timestamps (std=0.01), re-masked (reference dataloader.py:196-217).

    One stacked normal draw for both planes replaces two draws plus a
    key split (measured perf-neutral; kept for the simpler form).
    `draw_bits=16` (Config.rng_draw_bits) draws the normals in float16 —
    half the threefry words; the 16-bit inverse-CDF truncates the tails at
    ~3.3 sigma (0.1% of draws) and quantizes at ~1e-3 relative, both
    irrelevant for augmentation jitter and free of any parity contract
    (train-only, stream-keyed). Measured wall-neutral on the chip — see
    the Config.rng_draw_bits comment."""
    if draw_bits == 16:
        noise = jax.random.normal(
            key, (2,) + ob.shape, dtype=jnp.float16
        ).astype(jnp.float32)
    else:
        noise = jax.random.normal(key, (2,) + ob.shape)
    ob_n = (ob + noise[0] * ob_std) * padding_mask
    ts_n = (timestamp + noise[1] * 0.01) * padding_mask
    return ob_n, ts_n
