from . import multihost
from .multihost import device_fetch, is_main_process
from .cohort import ShardedCohort
from .mesh import (
    DATA_AXIS,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate_tree,
    pad_batch_to,
)

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_tree",
    "pad_batch_to",
    "ShardedCohort",
    "multihost",
    "device_fetch",
    "is_main_process",
]
