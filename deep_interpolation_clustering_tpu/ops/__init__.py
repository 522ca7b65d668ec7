from .interpolation import sci_forward, cci_forward, split_planes
from .rbf import rbf_decode, basis_func_dict
from .dec import soft_assignment, target_distribution
from .lstm import lstm_init, bilstm_forward
from . import nn

__all__ = [
    "sci_forward",
    "cci_forward",
    "split_planes",
    "rbf_decode",
    "basis_func_dict",
    "soft_assignment",
    "target_distribution",
    "lstm_init",
    "bilstm_forward",
    "nn",
]
