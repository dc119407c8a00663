"""Canonical workflow 4: DDM-preconditioned iterative solve.

TPU-native port of the reference's example/use_ddm_solver.py:49-67.  The
block-Jacobi preconditioner is one batched device LU over all subdomains;
the whole GMRES loop runs device-resident (solvers/krylov.py), replacing
the reference's HPDDM layer — the `-hpddm_*` option strings port verbatim.
"""

import copy
import logging

import matplotlib.pyplot as plt
import numpy as np

from _example_env import finish_plot, n_partitions  # noqa: I001
from create_geometry import create_random_geometries
from define_generators import CustomGenerator

import htool_python_tpu as Htool

logging.basicConfig(level=logging.INFO)

P = n_partitions(2)

# Random geometry
size = 1000
dimension = 3
[points, _] = create_random_geometries(dimension, size, size)

# Htool parameters
eta = 10
epsilon = 1e-3
maximal_leaf_size = 10
number_of_children = 2

# Build clusters
cluster_builder = Htool.ClusterTreeBuilder()
cluster_builder.set_maximal_leaf_size(maximal_leaf_size)
cluster = cluster_builder.create_cluster_tree(points, number_of_children, P)

# Build generator
generator = CustomGenerator(points, points)

# Build distributed operator (symmetric storage)
default_approximation = Htool.DefaultApproximationBuilder(
    generator, cluster, cluster,
    Htool.HMatrixTreeBuilder(epsilon, eta, "S", "L"), None)
hmatrix = default_approximation.hmatrix
Htool.recompression(hmatrix)

# Solver with block-Jacobi preconditioner (in-place factorization requires
# deepcopy, like the reference)
block_diagonal_hmatrix = copy.deepcopy(
    default_approximation.block_diagonal_hmatrix)

default_solver_builder = Htool.DDMSolverBuilder(
    default_approximation.distributed_operator, block_diagonal_hmatrix)
solver = default_solver_builder.solver

# Solve
x_ref = np.random.random(size)
b = default_approximation.distributed_operator * x_ref
x = np.zeros(size)

hpddm_args = "-hpddm_compute_residual l2 -hpddm_verbosity 10"
solver.set_hpddm_args(hpddm_args)
solver.set_hpddm_args("-hpddm_schwarz_method asm -hpddm_tol 1e-6 "
                      "-hpddm_max_it 200")
solver.facto_one_level()
solver.solve(x, b)

err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
print("solution rel err:", err)
assert err < 1e-3

# Several ways to display information
print(hmatrix[0].get_distributed_information())
print(hmatrix[0].get_local_information())
print(hmatrix[0].get_tree_parameters())
print(solver.get_information())

fig = plt.figure()
if dimension == 2:
    ax1 = fig.add_subplot(2, 2, 1)
    ax2 = fig.add_subplot(2, 2, 2)
else:
    ax1 = fig.add_subplot(2, 2, 1, projection="3d")
    ax2 = fig.add_subplot(2, 2, 2, projection="3d")
ax3 = fig.add_subplot(2, 2, 3)
ax4 = fig.add_subplot(2, 2, 4)
ax1.set_title("cluster at depth 1")
ax2.set_title("cluster at depth 2")
ax3.set_title("Hmatrix of partition 0")
ax4.set_title("Block diagonal Hmatrix of partition 0")
Htool.plot(ax1, cluster, points, 1)
Htool.plot(ax2, cluster, points, 2)
Htool.plot(ax3, hmatrix)
Htool.plot(ax4, default_approximation.block_diagonal_hmatrix)
finish_plot(fig, "use_ddm_solver")
