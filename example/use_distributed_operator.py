"""Canonical workflow 3: a row-partitioned distributed operator.

TPU-native port of the reference's example/use_distributed_operator.py:48-85.
Where the reference runs P MPI processes each building its block row, the
SPMD model holds every partition in one process: products run as batched
device code, and on a multi-device mesh the same block rows shard over
`jax.sharding.Mesh` (see ShardedDistributedOperator below).
"""

import logging

import matplotlib.pyplot as plt
import numpy as np

from _example_env import finish_plot, n_partitions  # noqa: I001
from create_geometry import create_partitionned_geometries
from define_generators import CustomGenerator

import htool_python_tpu as Htool

logging.basicConfig(level=logging.INFO)

P = n_partitions(2)  # the reference's mpi4py.MPI.COMM_WORLD.size

# Random geometry
nb_rows = 1000
nb_cols = 1000
dimension = 3
[target_points, source_points, target_partition] = (
    create_partitionned_geometries(dimension, nb_rows, nb_cols, P))

# Htool parameters
eta = 10
epsilon = 1e-3
maximal_leaf_size = 10
number_of_children = 2

# Build clusters
cluster_tree_builder = Htool.ClusterTreeBuilder()
cluster_tree_builder.set_maximal_leaf_size(maximal_leaf_size)
target_cluster = cluster_tree_builder.create_cluster_tree_from_local_partition(
    target_points, number_of_children, P, target_partition)
source_cluster = cluster_tree_builder.create_cluster_tree(
    source_points, number_of_children)

# Build generator
generator = CustomGenerator(target_points, source_points)

# Build distributed operator: every partition's block row (target rows x all
# source columns) as an H-matrix
default_approximation = Htool.DefaultApproximationBuilder(
    generator, target_cluster, source_cluster,
    Htool.HMatrixTreeBuilder(epsilon, eta, "N", "N"), None)

distributed_operator = default_approximation.distributed_operator
hmatrix = default_approximation.hmatrix
Htool.openmp_recompression(hmatrix)

# Test matrix vector product (global-to-global: full x in, full y out)
np.random.seed(0)
x = np.random.rand(nb_cols)
y_1 = distributed_operator * x
y_2 = generator.mat_vec(x)
err = np.linalg.norm(y_1 - y_2) / np.linalg.norm(y_2)
print("distributed matvec rel err:", err)
assert err < epsilon

# Test matrix matrix product
X = np.asfortranarray(np.random.rand(nb_cols, 2))
Y_1 = distributed_operator @ X
Y_2 = generator.mat_mat(X)
err = np.linalg.norm(Y_1 - Y_2) / np.linalg.norm(Y_2)
print("distributed matmat rel err:", err)
assert err < epsilon

# On a multi-device mesh the same block rows shard over the devices and the
# product becomes one shard_map program (all_gather on ICI):
import jax

if len(jax.devices()) >= P:
    from htool_python_tpu.parallel.sharded import (
        ShardedDistributedOperator, make_mesh)
    sharded = ShardedDistributedOperator(
        default_approximation.hmatrix, target_cluster, source_cluster,
        make_mesh(P))
    y_mesh = sharded * x
    print("sharded == single-device:",
          np.linalg.norm(y_mesh - y_1) / np.linalg.norm(y_1))

# Several ways to display information
print(distributed_operator.shape)
print(hmatrix[0].get_distributed_information())
print(hmatrix[0].get_local_information())
print(hmatrix[0].get_tree_parameters())

fig = plt.figure()
if dimension == 2:
    ax1 = fig.add_subplot(2, 2, 1)
    ax2 = fig.add_subplot(2, 2, 2)
    ax3 = fig.add_subplot(2, 2, 3)
else:
    ax1 = fig.add_subplot(2, 2, 1, projection="3d")
    ax2 = fig.add_subplot(2, 2, 2, projection="3d")
    ax3 = fig.add_subplot(2, 2, 3, projection="3d")
ax4 = fig.add_subplot(2, 2, 4)
ax1.set_title("target cluster at depth 1")
ax2.set_title("target cluster at depth 2")
ax3.set_title("source cluster at depth 1")
ax4.set_title("Hmatrix of partition 0")
Htool.plot(ax1, target_cluster, target_points, 1)
Htool.plot(ax2, target_cluster, target_points, 2)
Htool.plot(ax3, source_cluster, source_points, 1)
Htool.plot(ax4, hmatrix)
finish_plot(fig, "use_distributed_operator")
