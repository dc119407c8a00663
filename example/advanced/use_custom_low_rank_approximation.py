"""Plug a custom low-rank compressor into H-matrix assembly.

Two equivalent spellings wire the hook in (both matching the reference's
HMatrixTreeBuilder API): `set_low_rank_generator(hook)` after
construction, or passing it as the `low_rank_strategy` constructor
argument.  Assembly then calls the hook per admissible block instead of
the built-in device ACA; returning False densifies that block.
"""

import os
import sys

import numpy as np

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__),
                                             "..")))
from _example_env import finish_plot  # noqa: E402, F401, I001
from define_custom_low_rank_generator import CustomSVD  # noqa: E402
from define_generators import CustomGenerator  # noqa: E402

import htool_python_tpu as Htool  # noqa: E402
from htool_python_tpu.models.geometry import (  # noqa: E402
    create_random_points_in_sphere,
)

EPSILON = 1e-3


def main():
    np.random.seed(4)
    n = 700
    points = create_random_points_in_sphere(n)
    cb = Htool.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(20)
    cluster = cb.create_cluster_tree(points, 2)

    oracle = CustomGenerator(points, points)
    svd_hook = CustomSVD(oracle)

    # spelling 1: setter
    hb = Htool.HMatrixTreeBuilder(EPSILON, 100.0, "N", "N")
    hb.set_low_rank_generator(svd_hook)
    hm = hb.build(oracle, cluster, cluster)

    # spelling 2: constructor argument (reference `low_rank_strategy`)
    hb2 = Htool.HMatrixTreeBuilder(EPSILON, 100.0, "N", "N", -1,
                                   CustomSVD(oracle))
    hm2 = hb2.build(oracle, cluster, cluster)

    x = np.random.rand(n)
    y_exact = oracle.mat_vec(x)
    for name, h in [("setter", hm), ("ctor", hm2)]:
        rel = np.linalg.norm(h * x - y_exact) / np.linalg.norm(y_exact)
        print(f"{name}: matvec rel err {rel:.2e}")
        assert rel < EPSILON

    # SVD is rank-optimal: compare against the built-in ACA compression
    hm_aca = Htool.HMatrixTreeBuilder(EPSILON, 100.0, "N", "N").build(
        oracle, cluster, cluster)
    print("SVD-hook compression:",
          hm.get_local_information()["Compression_ratio"])
    print("default-ACA compression:",
          hm_aca.get_local_information()["Compression_ratio"])


if __name__ == "__main__":
    main()
