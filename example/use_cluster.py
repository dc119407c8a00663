"""Geometric cluster trees: the host-side setup stage of every workflow.

Everything compute-heavy in this framework runs on the accelerator, but the
cluster tree itself is cheap O(N log N) numpy run once — so it stays on the
host by design.  This example walks the tree API: splitting strategies,
leaf size, partitions for distributed operators, and the cluster plot.

Porting from Htool: `ClusterTreeBuilder`, the four partitioning strategies
(`PCARegular`, `PCAGeometric`, `BoundingBoxRegular`,
`BoundingBoxGeometric`), `Cluster.get_size/get_offset/get_permutation/
get_cluster_on_partition` and `plot(ax, cluster, points, depth)` keep the
reference names and semantics (reference example/use_cluster.py).
"""

import matplotlib.pyplot as plt
import numpy as np

from _example_env import finish_plot, n_partitions  # noqa: I001

import htool_python_tpu as Htool
from htool_python_tpu.models.geometry import create_random_points_in_sphere


def build_tree(points, strategy, leaf_size=16, children=2, partitions=None):
    builder = Htool.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(leaf_size)
    builder.set_partitioning_strategy(strategy)
    if partitions:
        return builder.create_cluster_tree(points, children,
                                           size_of_partition=partitions)
    return builder.create_cluster_tree(points, children)


def main():
    np.random.seed(7)
    points = create_random_points_in_sphere(600)
    P = n_partitions(2)

    # compare the four splitting policies on the same cloud
    strategies = {
        "PCARegular": Htool.PCARegular(),
        "PCAGeometric": Htool.PCAGeometric(),
        "BoundingBoxRegular": Htool.BoundingBoxRegular(),
        "BoundingBoxGeometric": Htool.BoundingBoxGeometric(),
    }
    trees = {name: build_tree(points, s) for name, s in strategies.items()}
    for name, tree in trees.items():
        leaf = tree.get_maximal_leaf_size()
        print(f"{name:22s} size={tree.get_size()} max_leaf={leaf}")

    # a partitioned tree: the top split defines P contiguous row blocks of
    # the internal numbering — the unit a distributed operator shards over
    part_tree = build_tree(points, Htool.PCARegular(), partitions=P)
    for p in range(P):
        node = part_tree.get_cluster_on_partition(p)
        print(f"partition {p}: offset={node.get_offset()} "
              f"size={node.get_size()}")

    # the permutation maps user point indices -> leaf-contiguous internal
    # order; products apply it at the device boundary
    perm = part_tree.get_permutation()
    assert sorted(perm) == list(range(len(perm)))

    fig = plt.figure(figsize=(9, 4.5))
    axes = [fig.add_subplot(1, 2, i + 1, projection="3d") for i in range(2)]
    axes[0].set_title("PCARegular, depth 2")
    axes[1].set_title(f"partitioned tree, depth 1 (P={P})")
    Htool.plot(axes[0], trees["PCARegular"], points, 2)
    Htool.plot(axes[1], part_tree, points, 1)
    finish_plot(fig, "use_cluster")


if __name__ == "__main__":
    main()
