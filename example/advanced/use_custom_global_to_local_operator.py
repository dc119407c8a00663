"""Advanced: fully user-provided local operators (reference:
example/advanced/use_custom_global_to_local_operator.py).  In the SPMD
model every partition's operator is registered in one process."""

import os
import sys

import numpy as np

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__),
                                             "..")))
from _example_env import n_partitions  # noqa: E402, I001
from create_geometry import create_partitionned_geometries  # noqa: E402
from define_custom_local_operator import (  # noqa: E402
    CustomRestrictedGlobalToLocalOperator,
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
maximal_leaf_size = 10
number_of_children = 2

# Build clusters
cluster_builder = Htool.ClusterTreeBuilder()
cluster_builder.set_maximal_leaf_size(maximal_leaf_size)
target_cluster = cluster_builder.create_cluster_tree_from_local_partition(
    target_points, number_of_children, P, target_partition)
source_cluster = cluster_builder.create_cluster_tree(
    source_points, number_of_children, size_of_partition=P)

# Build generator
generator = CustomGenerator(target_points, source_points)

# One custom operator per partition: its local target rows x ALL columns
local_operators = []
for p in range(P):
    local_cluster = target_cluster.get_cluster_on_partition(p)
    local_operators.append(CustomRestrictedGlobalToLocalOperator(
        generator,
        Htool.LocalRenumbering(local_cluster),
        Htool.LocalRenumbering(source_cluster)))

# Build distributed operator from the custom operators only
custom_local_approximation = Htool.CustomApproximationBuilder(
    target_cluster, source_cluster, None, local_operators)
distributed_operator = custom_local_approximation.distributed_operator

# Test matrix vector product
np.random.seed(0)
x = np.random.rand(nb_cols)
y_1 = distributed_operator * x
y_2 = generator.mat_vec(x)
err = np.linalg.norm(y_1 - y_2) / np.linalg.norm(y_2)
print("matvec rel err:", err)
assert err < 1e-12

# Test matrix matrix product
X = np.asfortranarray(np.random.rand(nb_cols, 2))
Y_1 = distributed_operator @ X
Y_2 = generator.mat_mat(X)
err = np.linalg.norm(Y_1 - Y_2) / np.linalg.norm(Y_2)
print("matmat rel err:", err)
assert err < 1e-12
