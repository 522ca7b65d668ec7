"""CLI entry points mirroring the reference's p0-p4 scripts:

    python -m deep_interpolation_clustering_tpu.cli.p0 --synthetic 1000
    python -m deep_interpolation_clustering_tpu.cli.p1
    python -m deep_interpolation_clustering_tpu.cli.p2
    python -m deep_interpolation_clustering_tpu.cli.p3
    python -m deep_interpolation_clustering_tpu.cli.p4 --cluster_method kmeans
"""
