from .kmeans import (
    KMeansResult,
    kmeans_fit,
    kmeans_predict,
    kmeans_inertia,
    mean_min_distance,
    pairwise_sq_dist,
)
from .metrics import (
    silhouette_score,
    calinski_harabasz_score,
    davies_bouldin_score,
    dunn_index,
    inertia_v1,
    inertia_v2,
    compute_internal_metrics,
    INTERNAL_METRICS,
)
from .sklearn_compat import kmeans_fit_sklearn, kmeanspp_sklearn
from .kneedle import kneedle
from .align import generate_align_map, align_labels, align_labels_with_center
from .optk import KSelection, DbscanExplorer, OpticsExplorer
from .final import FinalLabeler, load_feature_dumps

__all__ = [
    "KMeansResult",
    "kmeans_fit",
    "kmeans_predict",
    "kmeans_inertia",
    "mean_min_distance",
    "pairwise_sq_dist",
    "silhouette_score",
    "calinski_harabasz_score",
    "davies_bouldin_score",
    "dunn_index",
    "inertia_v1",
    "inertia_v2",
    "compute_internal_metrics",
    "INTERNAL_METRICS",
    "kmeans_fit_sklearn",
    "kmeanspp_sklearn",
    "kneedle",
    "generate_align_map",
    "align_labels",
    "align_labels_with_center",
    "KSelection",
    "DbscanExplorer",
    "OpticsExplorer",
    "FinalLabeler",
    "load_feature_dumps",
]
