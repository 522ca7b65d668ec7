"""deep_interpolation_clustering_tpu — TPU-native deep temporal
interpolation & clustering framework.

A brand-new JAX/XLA/Pallas implementation of the deep temporal
interpolation-clustering network for identifying acute-illness phenotypes from
irregularly-sampled multivariate vital signs (interpolation-prediction network
autoencoder + Deep Embedded Clustering), rebuilt TPU-first: jit/sharded data
parallelism over a device mesh, on-device k-means / gap statistic / validity
indices, and fused interpolation kernels.

Pipeline stages (mirroring the reference's p0-p4 scripts):
  p0  data gridding / imputation / hold-out / normalization   -> `.data`
  p1  interpolation autoencoder pretraining                    -> `.train.pretrain`
  p2  K selection (elbow, gap statistic, validity indices)     -> `.cluster`
  p3  DEC joint fine-tuning                                    -> `.train.cluster`
  p4  final labels with SBP-descending cluster alignment       -> `.cluster.align`
"""

__version__ = "0.1.0"

from .config import Config
from . import info

__all__ = ["Config", "info", "__version__"]
