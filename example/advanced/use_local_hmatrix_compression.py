"""Hybrid distributed operator: compressed diagonal, custom off-diagonal.

`DefaultLocalApproximationBuilder` compresses ONLY each partition's
diagonal block as an H-matrix; the off-diagonal coupling is the user's to
provide.  Here the two off-diagonal strips of every partition are
registered as dense `RestrictedGlobalToLocalOperator`s — the pattern for
applications whose far-field comes from another code path (an FMM, a
measurement matrix, a file).
"""

import os
import sys

import matplotlib.pyplot as plt
import numpy as np

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__),
                                             "..")))
from _example_env import finish_plot, n_partitions  # noqa: E402, I001
from define_custom_local_operator import (  # noqa: E402
    CustomRestrictedGlobalToLocalOperator,
)
from define_generators import CustomGenerator  # noqa: E402

import htool_python_tpu as Htool  # noqa: E402
from htool_python_tpu.models.geometry import (  # noqa: E402
    create_random_points_in_sphere,
)

EPSILON = 1e-3


def add_offdiagonal_strips(op, generator, target, source, p):
    """Register the two dense strips left and right of partition p's
    diagonal block (either may be empty)."""
    tloc = target.get_cluster_on_partition(p)
    sloc = source.get_cluster_on_partition(p)
    lo, sz = sloc.get_offset(), sloc.get_size()
    total = source.get_size()
    perm = source.get_permutation()
    for off, width in [(0, lo), (lo + sz, total - lo - sz)]:
        if width > 0:
            op.add_global_to_local_operator(
                CustomRestrictedGlobalToLocalOperator(
                    generator, Htool.LocalRenumbering(tloc),
                    Htool.LocalRenumbering(off, width, perm)), p)


def main():
    P = n_partitions(2)
    np.random.seed(2)
    n = 600
    points = create_random_points_in_sphere(n)
    cb = Htool.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(20)
    target = cb.create_cluster_tree(points, 2, size_of_partition=P)
    source = cb.create_cluster_tree(points, 2, size_of_partition=P)
    oracle = CustomGenerator(points, points)

    hb = Htool.HMatrixTreeBuilder(EPSILON, 10.0, "N", "N")
    local_approx = Htool.DefaultLocalApproximationBuilder(
        oracle, target, source, hb, None)
    op = local_approx.distributed_operator
    Htool.recompression(local_approx.hmatrix)

    for p in range(P):
        add_offdiagonal_strips(op, oracle, target, source, p)

    x = np.random.rand(n)
    exact = oracle.mat_vec(x)
    rel = np.linalg.norm(op * x - exact) / np.linalg.norm(exact)
    print(f"hybrid matvec rel err {rel:.2e}")
    assert rel < EPSILON

    X = np.asfortranarray(np.random.rand(n, 5))
    exact_m = oracle.mat_mat(X)
    rel_m = np.linalg.norm(op @ X - exact_m) / np.linalg.norm(exact_m)
    print(f"hybrid matmat rel err {rel_m:.2e}")
    assert rel_m < EPSILON

    print(local_approx.hmatrix[0].get_local_information())

    fig = plt.figure(figsize=(9, 4.5))
    ax1 = fig.add_subplot(1, 2, 1, projection="3d")
    ax2 = fig.add_subplot(1, 2, 2)
    ax1.set_title(f"source partitions (P={P})")
    ax2.set_title("compressed diagonal block, partition 0")
    Htool.plot(ax1, source, points, 1)
    Htool.plot(ax2, local_approx.hmatrix[0])
    finish_plot(fig, "use_local_hmatrix_compression")


if __name__ == "__main__":
    main()
