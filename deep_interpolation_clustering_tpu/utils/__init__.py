from .logging import get_logger, logger
from .timing import timer, block_timer, hard_sync
from .prng import set_seed
from .pytree import tree_size, global_norm
from .profiling import trace, annotate, StepTimer, device_memory_stats

__all__ = [
    "get_logger",
    "logger",
    "timer",
    "block_timer",
    "hard_sync",
    "set_seed",
    "tree_size",
    "global_norm",
    "trace",
    "annotate",
    "StepTimer",
    "device_memory_stats",
]
