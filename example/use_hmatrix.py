"""Canonical workflow 2: compress a kernel matrix as an H-matrix and use it.

TPU-native port of the reference's example/use_hmatrix.py:42-87.  Two
assembly paths are shown: the host VirtualGenerator escape hatch (parity
with the reference) and the TPU-native device generator, whose kernel
entries are computed in batched tiles on the accelerator.
"""

import logging

import matplotlib.pyplot as plt
import numpy as np

from _example_env import finish_plot  # noqa: I001
from create_geometry import (
    create_random_points_in_disk,
    create_random_points_in_sphere,
)
from define_generators import CustomGenerator, make_device_generator

import htool_python_tpu as Htool

logging.basicConfig(level=logging.INFO)

# Random geometry
size = 1000
dimension = 3
np.random.seed(0)
coordinates = (create_random_points_in_sphere(size) if dimension == 3
               else create_random_points_in_disk(size))

# Htool parameters
eta = 10
epsilon = 1e-3  # partial ACA's error estimate is loose above ~1e-2
maximal_leaf_size = 50
number_of_children = 2

# Build clusters
cluster_tree_builder = Htool.ClusterTreeBuilder()
cluster_tree_builder.set_maximal_leaf_size(maximal_leaf_size)
target_cluster = cluster_tree_builder.create_cluster_tree(
    coordinates, number_of_children)
source_cluster = cluster_tree_builder.create_cluster_tree(
    coordinates, number_of_children)

# Build generator (host oracle; swap in make_device_generator(...) for
# device-side assembly — same HMatrixTreeBuilder call)
generator = CustomGenerator(coordinates, coordinates)
device_generator = make_device_generator(coordinates, coordinates)

# HMatrix (symmetric storage: one triangle + mirror flags)
hmatrix_builder = Htool.HMatrixTreeBuilder(epsilon, eta, "S", "L")
hmatrix: Htool.HMatrix = hmatrix_builder.build(
    device_generator, target_cluster, source_cluster)

# HMatrix vector product
np.random.seed(0)
x = np.random.rand(size)
y_dense = generator.mat_vec(x)
y = hmatrix * x
err_vec = np.linalg.norm(y - y_dense) / np.linalg.norm(y_dense)
print("matvec rel err:", err_vec, "(epsilon:", epsilon, ")")
assert err_vec < epsilon

# HMatrix matrix product
np.random.seed(0)
X = np.random.rand(size, 2)
Y_dense = generator.mat_mat(X)
Y = hmatrix @ X
err_mat = np.linalg.norm(Y - Y_dense) / np.linalg.norm(Y_dense)
print("matmat rel err:", err_mat)
assert err_mat < epsilon

# H-LU direct solve (in-place: deepcopy first, like the reference)
import copy

lu = copy.deepcopy(hmatrix)
lu.lu_factorization()
b_h = hmatrix * x  # consistent RHS (reference contract, test_hmatrix.py:98)
x_sol = lu.lu_solve("N", b_h)
err_lu = np.linalg.norm(x_sol - x) / np.linalg.norm(x)
print("H-LU solve rel err:", err_lu)
assert err_lu < epsilon

# Output
print(hmatrix.shape[0], hmatrix.shape[1])
print(hmatrix.get_tree_parameters())
print(hmatrix.get_local_information())

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
ax4.set_title("Hmatrix")
Htool.plot(ax1, target_cluster, coordinates, 1)
Htool.plot(ax2, target_cluster, coordinates, 2)
Htool.plot(ax3, source_cluster, coordinates, 1)
Htool.plot(ax4, hmatrix)
finish_plot(fig, "use_hmatrix")
