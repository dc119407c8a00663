"""Advanced: build cluster trees from a user-supplied partition (reference:
example/advanced/use_cluster_with_given_partition.py) — local (offset,size)
table and global label array variants, plus per-partition subtrees."""

import os
import sys

import matplotlib.pyplot as plt
import numpy as np

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__),
                                             "..")))
from _example_env import finish_plot, n_partitions  # noqa: E402, I001
from create_geometry import create_partitionned_geometries  # noqa: E402

import htool_python_tpu as Htool  # noqa: E402

P = n_partitions(2)

# Random geometry
nb_rows = 500
nb_cols = 500
dimension = 3
[target_points, _, target_partition] = create_partitionned_geometries(
    dimension, nb_rows, nb_cols, P)

# Parameters
maximal_leaf_size = 10
number_of_children = 2

# Build clusters from the local (offset, size) partition table
cluster_builder = Htool.ClusterTreeBuilder()
cluster_builder.set_maximal_leaf_size(maximal_leaf_size)
cluster = cluster_builder.create_cluster_tree_from_local_partition(
    target_points, number_of_children, P, target_partition)

# Alternatively, use a global definition of the partition (length-N labels)
global_partition = np.zeros(nb_rows)
for i in range(P):
    lo = target_partition[0, i]
    global_partition[lo:lo + target_partition[1, i]] = i
print(global_partition)
cluster_2 = cluster_builder.create_cluster_tree_from_global_partition(
    target_points, number_of_children, P, global_partition)

# Per-partition subtree (the reference's "local cluster" of one rank)
local_cluster = cluster.get_cluster_on_partition(0)
print("partition 0 size:", local_cluster.get_size(),
      "offset:", local_cluster.get_offset())
assert local_cluster.get_size() == target_partition[1, 0]

fig = plt.figure()
if dimension == 2:
    ax1 = fig.add_subplot(1, 2, 1)
    ax2 = fig.add_subplot(1, 2, 2)
else:
    ax1 = fig.add_subplot(1, 2, 1, projection="3d")
    ax2 = fig.add_subplot(1, 2, 2, projection="3d")
ax1.set_title("target cluster\ndepth 1")
ax2.set_title("local cluster\ntarget partition number 0\ndepth 1")
Htool.plot(ax1, cluster, target_points, 1)
Htool.plot(ax2, local_cluster, target_points, 1)
finish_plot(fig, "use_cluster_with_given_partition")
