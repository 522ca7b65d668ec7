"""Device mesh + sharding helpers.

The reference's only parallelism is single-process `torch.nn.DataParallel`
(pretrain_trainer.py:21, clustering_trainer.py:25) — replicate the module,
scatter the batch over local GPUs, gather. The TPU-native equivalent is a
1-D `jax.sharding.Mesh` over all chips with the batch sharded on the `data`
axis and parameters replicated; XLA inserts the gradient `psum` over ICI and
makes batch-norm statistics global-batch reductions automatically, matching
the reference's single-process global-batch semantics.

Everything here also runs on a virtual CPU mesh
(`--xla_force_host_platform_device_count=N`), which is how tests and the
driver's multi-chip dry-run exercise the sharded paths without N real chips.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_data: int = 0, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh. `n_data=0` uses every local device."""
    if devices is None:
        devices = jax.devices()
    n = n_data if n_data > 0 else len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], batch: Dict[str, np.ndarray]) -> Dict:
    """Device-put the array values of a batch dict, batch-axis sharded.

    Non-array entries (`index`, encounter ids) pass through untouched.
    """
    if mesh is None:
        return batch
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if k == "index" or not isinstance(v, (np.ndarray, jax.Array)):
            out[k] = v
        else:
            out[k] = jax.device_put(v, sharding)
    return out


def replicate_tree(mesh: Optional[Mesh], tree):
    """Replicate a parameter pytree across the mesh."""
    if mesh is None:
        return tree
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to(batch: Dict[str, np.ndarray], size: int):
    """Pad every array's leading axis to `size` by cyclically REPEATING the
    real rows; adds `sample_mask` marking real rows so loss/metric
    reductions (and train-mode BatchNorm moments) ignore the padding.

    Repeat — not zero — because an all-zero row has an all-zero padding
    mask, and the interpolation ops' masked `log(0)=-inf` logsumexp then
    yields NaN values whose zero loss-cotangents still poison gradients
    (`0 * NaN = NaN`); repeated real rows keep every intermediate finite.
    (Eval observables are unaffected either way: losses use `where`-masked
    reductions, dumps are sliced to the real rows.)

    Keeps every batch the same shape (one XLA compilation) and keeps the
    batch divisible across the mesh. Returns `(padded_batch, n_real)`.
    """
    n = None
    for v in batch.values():
        if isinstance(v, np.ndarray):
            n = v.shape[0]
            break
    assert n is not None and n <= size
    wrap = np.arange(size) % n
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.shape[0] == n:
            out[k] = v[wrap]
        else:
            out[k] = v
    mask = np.zeros((size,), np.float32)
    mask[:n] = 1.0
    out["sample_mask"] = mask
    return out, n
