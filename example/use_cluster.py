"""Canonical workflow 1: build a geometric cluster tree and plot it.

TPU-native port of the reference's example/use_cluster.py:18-41 — identical
API surface (ClusterTreeBuilder, partitioning strategies, Htool-style
plot); the tree build is host numpy setup code by design (SURVEY.md §7).
"""

import matplotlib.pyplot as plt
import numpy as np

from _example_env import finish_plot  # noqa: I001 (example scaffolding)
from create_geometry import create_random_geometries

import htool_python_tpu as Htool

# Random geometry
nb_rows = 500
nb_cols = 500
dimension = 3
[target_points, _] = create_random_geometries(dimension, nb_rows, nb_cols)

# Parameters
maximal_leaf_size = 10
number_of_children = 2

# Cluster builder
cluster_builder = Htool.ClusterTreeBuilder()
cluster_builder.set_maximal_leaf_size(maximal_leaf_size)

# Strategies (PCA / bounding-box direction x regular / geometric splitting)
partitioning_strategy = Htool.PCARegular()
cluster_builder.set_partitioning_strategy(partitioning_strategy)

# Build cluster
target_cluster: Htool.Cluster = cluster_builder.create_cluster_tree(
    target_points, number_of_children
)

print("cluster size:", target_cluster.get_size())
print("permutation head:", target_cluster.get_permutation()[:8])
assert target_cluster.get_size() == nb_rows

fig = plt.figure()
if dimension == 2:
    ax1 = fig.add_subplot(1, 1, 1)
else:
    ax1 = fig.add_subplot(1, 1, 1, projection="3d")
ax1.set_title("target cluster\ndepth 2")
Htool.plot(ax1, target_cluster, target_points, 2)
finish_plot(fig, "use_cluster")
