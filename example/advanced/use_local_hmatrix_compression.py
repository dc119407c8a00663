"""Advanced: diagonal blocks compressed as H-matrices, off-diagonal blocks
as custom dense operators (reference:
example/advanced/use_local_hmatrix_compression.py)."""

import logging
import os
import sys

import matplotlib.pyplot as plt
import numpy as np

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__),
                                             "..")))
from _example_env import finish_plot, n_partitions  # noqa: E402, I001
from create_geometry import create_random_geometries  # noqa: E402
from define_custom_local_operator import (  # noqa: E402
    CustomGlobalToLocalOperator,
)
from define_generators import CustomGenerator  # noqa: E402

import htool_python_tpu as Htool  # noqa: E402

logging.basicConfig(level=logging.INFO)

P = n_partitions(2)

# Random geometry
target_size = 500
source_size = 500
dimension = 3
[target_points, source_points] = create_random_geometries(
    dimension, target_size, source_size)

# Htool parameters
eta = 10
epsilon = 1e-3
maximal_leaf_size = 10
number_of_children = 2

# Build clusters
cluster_builder = Htool.ClusterTreeBuilder()
cluster_builder.set_maximal_leaf_size(maximal_leaf_size)
target_cluster = cluster_builder.create_cluster_tree(
    target_points, number_of_children, P)
source_cluster = cluster_builder.create_cluster_tree(
    source_points, number_of_children, P)

# Build generator
generator = CustomGenerator(target_points, source_points)

# Diagonal blocks compressed as H-matrices
default_local_approximation = Htool.DefaultLocalApproximationBuilder(
    generator, target_cluster, source_cluster,
    Htool.HMatrixTreeBuilder(epsilon, eta, "N", "N"), None)
distributed_operator = default_local_approximation.distributed_operator
hmatrix = default_local_approximation.hmatrix
Htool.recompression(hmatrix)

# Off-diagonal strips as custom dense operators
for p in range(P):
    local_target_cluster = target_cluster.get_cluster_on_partition(p)
    local_source_cluster = source_cluster.get_cluster_on_partition(p)
    off = local_source_cluster.get_offset()
    sz = local_source_cluster.get_size()
    total = source_cluster.get_size()
    if off > 0:
        distributed_operator.add_global_to_local_operator(
            CustomGlobalToLocalOperator(
                generator, Htool.LocalRenumbering(local_target_cluster),
                Htool.LocalRenumbering(0, off,
                                       source_cluster.get_permutation())), p)
    if total - sz - off > 0:
        distributed_operator.add_global_to_local_operator(
            CustomGlobalToLocalOperator(
                generator, Htool.LocalRenumbering(local_target_cluster),
                Htool.LocalRenumbering(off + sz, total - sz - off,
                                       source_cluster.get_permutation())), p)

# Test matrix vector product
np.random.seed(0)
x = np.random.rand(source_size)
y_1 = distributed_operator * x
y_2 = generator.mat_vec(x)
err = np.linalg.norm(y_1 - y_2) / np.linalg.norm(y_2)
print("matvec rel err:", err)
assert err < epsilon

# Test matrix matrix product
X = np.asfortranarray(np.random.rand(source_size, 5))
Y_1 = distributed_operator @ X
Y_2 = generator.mat_mat(X)
err = np.linalg.norm(Y_1 - Y_2) / np.linalg.norm(Y_2)
print("matmat rel err:", err)
assert err < epsilon

# Several ways to display information
print(hmatrix[0].get_distributed_information())
print(hmatrix[0].get_local_information())
print(hmatrix[0].get_tree_parameters())

fig = plt.figure()
if dimension == 2:
    ax1 = fig.add_subplot(2, 2, 1)
    ax2 = fig.add_subplot(2, 2, 2)
else:
    ax1 = fig.add_subplot(2, 2, 1, projection="3d")
    ax2 = fig.add_subplot(2, 2, 2, projection="3d")
ax3 = fig.add_subplot(2, 2, 4)
ax1.set_title("source cluster at depth 1")
ax2.set_title("source cluster at depth 2")
ax3.set_title("Hmatrix of partition 0")
Htool.plot(ax1, source_cluster, source_points, 1)
Htool.plot(ax2, source_cluster, source_points, 2)
Htool.plot(ax3, hmatrix)
finish_plot(fig, "use_local_hmatrix_compression")
