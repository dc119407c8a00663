"""Advanced: batched dense-leaf assembly callback (reference:
example/advanced/use_custom_dense_block_generator.py)."""

import os
import sys

import numpy as np

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__),
                                             "..")))
from _example_env import n_partitions  # noqa: E402, I001
from create_geometry import create_partitionned_geometries  # noqa: E402
from define_custom_dense_blocks_generator import (  # noqa: E402
    CustomDenseBlocksGenerator,
)
from define_generators import CustomGenerator  # noqa: E402

import htool_python_tpu as Htool  # noqa: E402

P = n_partitions(2)

# Random geometry
nb_rows = 500
nb_cols = 500
dimension = 3
[target_points, source_points, target_partition] = (
    create_partitionned_geometries(dimension, nb_rows, nb_cols, P))

# Htool parameters
eta = 10
epsilon = 1e-3
maximal_leaf_size = 10
number_of_children = 2

# Build clusters
cluster_builder = Htool.ClusterTreeBuilder()
cluster_builder.set_maximal_leaf_size(maximal_leaf_size)
target_cluster = cluster_builder.create_cluster_tree_from_local_partition(
    target_points, number_of_children, P, target_partition)
source_cluster = cluster_builder.create_cluster_tree(
    source_points, number_of_children, size_of_partition=P)

# Build generator + batched dense-blocks callback
generator = CustomGenerator(target_points, source_points)
dense_blocks_generator = CustomDenseBlocksGenerator(
    generator, target_cluster, source_cluster)

hmatrix_builder = Htool.HMatrixTreeBuilder(epsilon, eta, "N", "N")
hmatrix_builder.set_dense_blocks_generator(dense_blocks_generator)

# Build distributed operator
default_approximation = Htool.DefaultApproximationBuilder(
    generator, target_cluster, source_cluster, hmatrix_builder, None)
distributed_operator = default_approximation.distributed_operator

# Test matrix vector product
np.random.seed(0)
x = np.random.rand(nb_cols)
y_1 = distributed_operator * x
y_2 = generator.mat_vec(x)
err = np.linalg.norm(y_1 - y_2) / np.linalg.norm(y_2)
print("matvec rel err:", err)
assert err < epsilon

# Test matrix matrix product
X = np.asfortranarray(np.random.rand(nb_cols, 2))
Y_1 = distributed_operator @ X
Y_2 = generator.mat_mat(X)
err = np.linalg.norm(Y_1 - Y_2) / np.linalg.norm(Y_2)
print("matmat rel err:", err)
assert err < epsilon
