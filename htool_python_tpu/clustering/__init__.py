from .cluster import Cluster, ClusterTree, ClusterTreeBuilder
from .partitioning import (
    BoundingBoxGeometric,
    BoundingBoxRegular,
    PCAGeometric,
    PCARegular,
    VirtualPartitioning,
)
from .io import read_cluster_from, write_cluster_to

__all__ = [
    "Cluster",
    "ClusterTree",
    "ClusterTreeBuilder",
    "PCARegular",
    "PCAGeometric",
    "BoundingBoxRegular",
    "BoundingBoxGeometric",
    "VirtualPartitioning",
    "read_cluster_from",
    "write_cluster_to",
]
