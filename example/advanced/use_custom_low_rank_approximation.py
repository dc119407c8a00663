"""Advanced: plug a custom low-rank compressor into assembly (reference:
example/advanced/use_custom_low_rank_approximation.py)."""

import os
import sys

import numpy as np

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__),
                                             "..")))
from _example_env import n_partitions  # noqa: E402, I001
from create_geometry import create_partitionned_geometries  # noqa: E402
from define_custom_low_rank_generator import CustomSVD  # noqa: E402
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
eta = 100
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

# Build generator + custom low-rank compressor
generator = CustomGenerator(target_points, source_points)
low_rank_generator = CustomSVD(generator)

# Build HMatrix with the custom compressor
hmatrix_builder = Htool.HMatrixTreeBuilder(epsilon, eta, "N", "N")
hmatrix_builder.set_low_rank_generator(low_rank_generator)

# Build distributed operator
distributed_operator_from_hmatrix = Htool.DefaultApproximationBuilder(
    generator, target_cluster, source_cluster, hmatrix_builder, None)

distributed_operator = distributed_operator_from_hmatrix.distributed_operator
hmatrix = distributed_operator_from_hmatrix.hmatrix
Htool.openmp_recompression(hmatrix)

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

print(hmatrix[0].get_local_information())
print(hmatrix[0].get_tree_parameters())
