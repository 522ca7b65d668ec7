from .logging import get_logger, logger
from .timing import timer
from .prng import set_seed
from .pytree import tree_size, global_norm

__all__ = ["get_logger", "logger", "timer", "set_seed", "tree_size", "global_norm"]
