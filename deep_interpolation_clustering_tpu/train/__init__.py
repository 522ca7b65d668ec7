from .optim import LRSchedule, make_optimizer, set_learning_rate, get_learning_rate
from .steps import make_train_step, make_eval_step, build_inputs
from .trainer import Trainer
from .cluster_trainer import ClusterTrainer
from .summary import Summary
from . import checkpoint

__all__ = [
    "LRSchedule",
    "make_optimizer",
    "set_learning_rate",
    "get_learning_rate",
    "make_train_step",
    "make_eval_step",
    "build_inputs",
    "Trainer",
    "ClusterTrainer",
    "Summary",
    "checkpoint",
]
