"""A distributed operator made entirely of user-provided operators.

`CustomApproximationBuilder` skips H-matrix assembly: each partition's
block row is whatever `RestrictedGlobalToLocalOperator` subclass the user
registers (here a dense one wrapping the oracle generator).  Products are
then exact, and the example checks them to machine precision.  The same
mechanism mixes user operators with H-matrix blocks — see
use_local_hmatrix_compression.py.
"""

import os
import sys

import numpy as np

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__),
                                             "..")))
from _example_env import n_partitions  # noqa: E402, I001
from define_custom_local_operator import (  # noqa: E402
    CustomRestrictedGlobalToLocalOperator,
)
from define_generators import CustomGenerator  # noqa: E402

import htool_python_tpu as Htool  # noqa: E402
from htool_python_tpu.models.geometry import (  # noqa: E402
    create_random_points_in_sphere,
)


def main():
    P = n_partitions(2)
    np.random.seed(13)
    n = 600
    points = create_random_points_in_sphere(n)
    cb = Htool.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(20)
    target = cb.create_cluster_tree(points, 2, size_of_partition=P)
    source = cb.create_cluster_tree(points, 2, size_of_partition=P)
    oracle = CustomGenerator(points, points)

    # one user operator per partition: that partition's target rows
    # against the FULL source width
    ops = [CustomRestrictedGlobalToLocalOperator(
        oracle,
        Htool.LocalRenumbering(target.get_cluster_on_partition(p)),
        Htool.LocalRenumbering(source))
        for p in range(P)]

    approx = Htool.CustomApproximationBuilder(target, source, None, ops)
    A = approx.distributed_operator

    x = np.random.rand(n)
    exact = oracle.mat_vec(x)
    assert np.linalg.norm(A * x - exact) < 1e-12 * np.linalg.norm(exact)
    X = np.asfortranarray(np.random.rand(n, 2))
    exact_m = oracle.mat_mat(X)
    assert np.linalg.norm(A @ X - exact_m) < 1e-12 * np.linalg.norm(exact_m)
    print("custom-operator products match the oracle to machine precision")


if __name__ == "__main__":
    main()
