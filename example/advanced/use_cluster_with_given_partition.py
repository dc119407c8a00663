"""Cluster trees over a partition the application already owns.

When the row distribution comes from outside (a mesh partitioner, an
existing decomposition), the tree must respect it instead of computing its
own top split.  Two input formats are accepted, matching the reference:

* local table: a (2, P) array of (offset, size) pairs — the points of
  partition p are the contiguous user-index range
  [offset_p, offset_p + size_p);
* global labels: a length-N array assigning each point its partition.

Below the partition level the builder subdivides normally.
"""

import os
import sys

import matplotlib.pyplot as plt
import numpy as np

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__),
                                             "..")))
from _example_env import finish_plot, n_partitions  # noqa: E402, I001

import htool_python_tpu as Htool  # noqa: E402
from htool_python_tpu.models.geometry import (  # noqa: E402
    create_partitioned_geometries,
)


def main():
    P = n_partitions(2)
    points, _, table = create_partitioned_geometries(3, 600, 600, P)

    builder = Htool.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(20)

    # format 1: (2, P) offset/size table
    tree_local = builder.create_cluster_tree_from_local_partition(
        points, 2, P, table)

    # format 2: per-point labels describing the same partition
    labels = np.zeros(points.shape[1], dtype=np.int64)
    for p in range(P):
        lo, sz = int(table[0, p]), int(table[1, p])
        labels[lo:lo + sz] = p
    tree_global = builder.create_cluster_tree_from_global_partition(
        points, 2, P, labels)

    # both formats produce the same partition-level layout
    for p in range(P):
        a = tree_local.get_cluster_on_partition(p)
        b = tree_global.get_cluster_on_partition(p)
        assert a.get_size() == b.get_size() == int(table[1, p])
        print(f"partition {p}: size {a.get_size()}, "
              f"internal offset {a.get_offset()}")

    fig = plt.figure(figsize=(9, 4.5))
    ax1 = fig.add_subplot(1, 2, 1, projection="3d")
    ax2 = fig.add_subplot(1, 2, 2, projection="3d")
    ax1.set_title("given partition, depth 1")
    ax2.set_title("partition-0 subtree, depth 1")
    Htool.plot(ax1, tree_local, points, 1)
    Htool.plot(ax2, tree_local.get_cluster_on_partition(0), points, 1)
    finish_plot(fig, "use_cluster_with_given_partition")


if __name__ == "__main__":
    main()
