"""Assemble the dense leaves through the batched user callback.

`set_dense_blocks_generator(hook)` routes EVERY non-admissible leaf block
to one `build_dense_blocks` call (see
define_custom_dense_blocks_generator.py); admissible blocks still go
through the usual low-rank compression.  Useful when entries come from an
external source (quadrature code, a file, another library) that prefers
one bulk request over per-block callbacks.
"""

import os
import sys

import numpy as np

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__),
                                             "..")))
from _example_env import finish_plot  # noqa: E402, F401, I001
from define_custom_dense_blocks_generator import (  # noqa: E402
    CustomDenseBlocksGenerator,
)
from define_generators import CustomGenerator  # noqa: E402

import htool_python_tpu as Htool  # noqa: E402
from htool_python_tpu.models.geometry import (  # noqa: E402
    create_random_points_in_sphere,
)

EPSILON = 1e-3


def main():
    np.random.seed(11)
    n = 700
    points = create_random_points_in_sphere(n)
    cb = Htool.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(20)
    cluster = cb.create_cluster_tree(points, 2)

    oracle = CustomGenerator(points, points)
    hook = CustomDenseBlocksGenerator(oracle, cluster, cluster)

    hb = Htool.HMatrixTreeBuilder(EPSILON, 10.0, "N", "N")
    hb.set_dense_blocks_generator(hook)
    hm = hb.build(oracle, cluster, cluster)

    x = np.random.rand(n)
    y_exact = oracle.mat_vec(x)
    rel = np.linalg.norm(hm * x - y_exact) / np.linalg.norm(y_exact)
    print(f"matvec rel err {rel:.2e}")
    assert rel < EPSILON

    X = np.random.rand(n, 2)
    rel_m = (np.linalg.norm(hm @ X - oracle.mat_mat(X))
             / np.linalg.norm(oracle.mat_mat(X)))
    print(f"matmat rel err {rel_m:.2e}")
    assert rel_m < EPSILON
    print(hm.get_local_information())


if __name__ == "__main__":
    main()
