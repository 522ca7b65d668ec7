from .preprocess import (
    generate_data,
    mean_imputation,
    hold_out,
    normalize_data,
    process_splits,
)
from .synthetic import make_synthetic_cohorts
from .loader import ArrayDataset, make_fake_ob, augment_batch
from .abnormal import extract_abnormal_vitals

__all__ = [
    "generate_data",
    "mean_imputation",
    "hold_out",
    "normalize_data",
    "process_splits",
    "make_synthetic_cohorts",
    "ArrayDataset",
    "make_fake_ob",
    "augment_batch",
    "extract_abnormal_vitals",
]
