"""Cluster-tree tests (parity with reference tests/test_cluster.py)."""

import numpy as np
import pytest

import htool_python_tpu as H


@pytest.mark.parametrize(
    "dimension,nb_rows,nb_cols,symmetry,partition_type,number_of_children,n_partitions",
    [
        (2, 500, 500, "N", "None", 2, 1),
        (2, 500, 500, "N", "None", 2, 4),
        (3, 500, 500, "N", "None", 2, 4),
        (2, 500, 500, "N", "Local", 2, 4),
        (3, 500, 500, "N", "Local", 2, 4),
        (2, 500, 500, "N", "Global", 2, 4),
        (3, 500, 500, "N", "Global", 2, 4),
        (2, 500, 500, "N", "None", 3, 3),
        (2, 500, 500, "N", "None", 9, 2),
        (2, 500, 500, "N", "None", 10, 2),
    ],
)
def test_cluster(geometry, cluster, n_partitions):
    [target_points, _, target_partition] = geometry
    [target_cluster, _] = cluster

    total_size = 0
    for p in range(n_partitions):
        node = target_cluster.get_cluster_on_partition(p)
        total_size += node.get_size()
    assert total_size == len(target_cluster.get_permutation())

    # permutation is a bijection
    perm = target_cluster.get_permutation()
    assert np.array_equal(np.sort(perm), np.arange(len(perm)))

    # every partition covers a contiguous internal range and the ranges tile
    offsets = sorted(
        (target_cluster.get_cluster_on_partition(p).get_offset(),
         target_cluster.get_cluster_on_partition(p).get_size())
        for p in range(n_partitions))
    cursor = 0
    for off, sz in offsets:
        assert off == cursor
        cursor += sz
    assert cursor == total_size

    # leaves respect the maximal leaf size (when children count allows)
    tree = target_cluster.tree
    for n in range(tree.nb_nodes):
        if tree.is_leaf(n):
            assert tree.sizes[n] <= max(10, 1)

    # user-provided partition modes must place user indices as requested
    if target_partition is not None:
        for p in range(n_partitions):
            node = target_cluster.get_cluster_on_partition(p)
            users = perm[node.get_offset():node.get_offset() + node.get_size()]
            lo = target_partition[0, p]
            expected = np.arange(lo, lo + target_partition[1, p])
            assert np.array_equal(np.sort(users), expected)


@pytest.mark.parametrize(
    "dimension,nb_rows,nb_cols,symmetry,partition_type,number_of_children,n_partitions",
    [(2, 500, 500, "N", "None", 2, 2), (3, 500, 500, "N", "None", 2, 2)],
)
def test_cluster_plot(geometry, cluster):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    [target_points, _, _] = geometry
    [target_cluster, _] = cluster
    local = target_cluster.get_cluster_on_partition(0)
    fig, ax = plt.subplots(2, 2)
    H.plot(ax[0, 0], target_cluster, target_points, 1)
    H.plot(ax[0, 1], target_cluster, target_points, 2)
    H.plot(ax[1, 0], local, target_points, 1)
    H.plot(ax[1, 1], local, target_points, 2)
    plt.close(fig)


@pytest.mark.parametrize("strategy", [
    H.PCARegular(), H.PCAGeometric(),
    H.BoundingBoxRegular(), H.BoundingBoxGeometric(),
])
def test_partitioning_strategies(strategy):
    np.random.seed(3)
    points = np.random.rand(3, 300)
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(20)
    builder.set_partitioning_strategy(strategy)
    cluster = builder.create_cluster_tree(points, 2)
    perm = cluster.get_permutation()
    assert np.array_equal(np.sort(perm), np.arange(300))


def test_cluster_io(tmp_path):
    np.random.seed(1)
    points = np.random.rand(3, 200)
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(15)
    cluster = builder.create_cluster_tree(points, 2, size_of_partition=2)
    props = str(tmp_path / "c_cluster_tree_properties.csv")
    tree = str(tmp_path / "c_cluster_tree.csv")
    H.write_cluster_to(cluster, props, tree)
    loaded = H.read_cluster_from(props, tree)
    assert loaded.get_size() == cluster.get_size()
    assert np.array_equal(loaded.get_permutation(), cluster.get_permutation())
    for p in range(2):
        a = loaded.get_cluster_on_partition(p)
        b = cluster.get_cluster_on_partition(p)
        assert a.get_offset() == b.get_offset()
        assert a.get_size() == b.get_size()


def test_radii_and_weights():
    np.random.seed(2)
    points = np.random.rand(2, 100)
    radii = 0.01 * np.ones(100)
    weights = np.linspace(1, 2, 100)
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(10)
    cluster = builder.create_cluster_tree(points, 2, radii=radii,
                                          weights=weights)
    assert cluster.get_size() == 100
    assert cluster.get_radius() > 0
