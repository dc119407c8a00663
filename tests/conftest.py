"""Test configuration: virtual multi-device CPU mesh + x64 precision.

Mirrors the reference's test strategy (SURVEY.md §4): the reference runs
the same pytest files under `mpirun -np {1,2,3,4}`; here the same coverage
is a parametrized `n_partitions` in {1, 2, 3, 4} over a single process with
an 8-device virtual CPU mesh (sharded paths) — accuracy asserted against
the same three oracle patterns (brute-force kernel, densified
self-consistency, golden solver data).
"""

import os

# must be set before jax import; note the driver environment exports
# JAX_PLATFORMS=axon (remote TPU), so tests must OVERRIDE it, not setdefault
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import htool_python_tpu as H  # noqa: E402


class CustomGenerator(H.VirtualGenerator):
    """Brute-force oracle generator: 1/(0.1+|x-y|) kernel in user numbering
    (same contract as the reference's example/define_generators.py)."""

    def __init__(self, target_points, source_points):
        super().__init__()
        self.target_points = np.asarray(target_points)
        self.source_points = np.asarray(source_points)
        self.nb_rows = self.target_points.shape[1]
        self.nb_cols = self.source_points.shape[1]

    def _block(self, J, K):
        t = self.target_points[:, np.asarray(J)]
        s = self.source_points[:, np.asarray(K)]
        d = np.linalg.norm(t[:, :, None] - s[:, None, :], axis=0)
        return 1.0 / (1e-1 + d)

    def build_submatrix(self, J, K, mat):
        mat[:, :] = self._block(J, K)

    def dense(self):
        return self._block(np.arange(self.nb_rows), np.arange(self.nb_cols))

    def mat_vec(self, x):
        return self.dense() @ x

    def mat_mat(self, X):
        return self.dense() @ X


@pytest.fixture
def geometry(partition_type, dimension, nb_rows, nb_cols, symmetry,
             n_partitions):
    np.random.seed(0)
    target_partition = None
    if partition_type != "None":
        target_points = np.zeros((dimension, nb_rows))
        local = nb_rows // n_partitions
        target_partition = np.zeros((2, n_partitions), dtype=int)
        for i in range(n_partitions - 1):
            target_partition[0, i] = i * local
            target_partition[1, i] = local
            target_points[0, i * local:(i + 1) * local] = i
        target_points[0, (n_partitions - 1) * local:] = n_partitions - 1
        target_partition[0, -1] = (n_partitions - 1) * local
        target_partition[1, -1] = nb_rows - (n_partitions - 1) * local
        target_points[1:, :] = np.random.rand(dimension - 1, nb_rows)
    else:
        target_points = np.random.random((dimension, nb_rows))

    if symmetry == "N":
        source_points = np.random.random((dimension, nb_cols))
    else:
        source_points = target_points
    return [target_points, source_points, target_partition]


@pytest.fixture
def cluster(geometry, symmetry, partition_type, number_of_children,
            n_partitions):
    [target_points, source_points, target_partition] = geometry
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(10)
    source_cluster = None
    if symmetry == "N":
        source_cluster = builder.create_cluster_tree(
            source_points, number_of_children,
            size_of_partition=n_partitions, radii=None, weights=None)
    if target_partition is not None:
        if partition_type == "Local":
            target_cluster = builder.create_cluster_tree_from_local_partition(
                target_points, number_of_children, n_partitions,
                target_partition, radii=None, weights=None)
        else:
            labels = np.zeros(target_points.shape[1])
            for i in range(n_partitions):
                lo = target_partition[0, i]
                labels[lo:lo + target_partition[1, i]] = i
            target_cluster = builder.create_cluster_tree_from_global_partition(
                target_points, number_of_children, n_partitions, labels,
                radii=None, weights=None)
    else:
        target_cluster = builder.create_cluster_tree(
            target_points, number_of_children,
            size_of_partition=n_partitions, radii=None, weights=None)
    if symmetry in ("S", "H"):
        source_cluster = target_cluster
    return [target_cluster, source_cluster]


@pytest.fixture
def generator(geometry):
    [target_points, source_points, _] = geometry
    return CustomGenerator(target_points, source_points)
