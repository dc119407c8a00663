"""Compress a kernel operator into an H-matrix and use it on the device.

The TPU-native workflow: define the kernel as a jax-traceable function of
coordinates, hand it to `KernelGenerator`, and assembly (batched ACA + SVD
re-truncation), products (fused Pallas block-GEMM streams), and the
hierarchical direct solve all run on the accelerator.  The dense oracle is
built once in numpy purely to check accuracy.

Porting from Htool: `HMatrixTreeBuilder(epsilon, eta, symmetry, UPLO)` /
`build(generator, target, source)` / `*`, `@`, `lu_factorization`,
`lu_solve`, `get_*_information` keep the reference API
(example/use_hmatrix.py); the host `VirtualGenerator.build_submatrix`
escape hatch still works (see define_generators.CustomGenerator) but pays
a Python crossing per block, exactly like the reference.
"""

import copy

import matplotlib.pyplot as plt
import numpy as np

from _example_env import finish_plot  # noqa: I001

import htool_python_tpu as Htool
from htool_python_tpu.models.geometry import create_random_points_in_sphere
from htool_python_tpu.models.kernels import inverse_distance_kernel

EPSILON = 1e-3
ETA = 10.0


def assemble(points):
    """Device assembly: the jax kernel is evaluated on the accelerator in
    batched tiles; no per-block Python callbacks."""
    builder = Htool.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(64)
    cluster = builder.create_cluster_tree(points, 2)
    generator = Htool.KernelGenerator(inverse_distance_kernel(0.1),
                                      points, points)
    # symmetric one-triangle storage: mirror blocks contribute transposed
    hmatrix_builder = Htool.HMatrixTreeBuilder(EPSILON, ETA, "S", "L")
    return cluster, hmatrix_builder.build(generator, cluster, cluster)


def dense_oracle(points):
    d = np.linalg.norm(points[:, :, None] - points[:, None, :], axis=0)
    return 1.0 / (0.1 + d)


def main():
    np.random.seed(1)
    n = 1200
    points = create_random_points_in_sphere(n)
    cluster, hm = assemble(points)
    A = dense_oracle(points)

    # --- products (device; numpy in -> numpy out, jax in -> jax out) ---
    x = np.random.rand(n)
    rel = np.linalg.norm(hm * x - A @ x) / np.linalg.norm(A @ x)
    print(f"matvec rel err {rel:.2e} (epsilon {EPSILON:g})")
    assert rel < EPSILON

    X = np.random.rand(n, 4)
    rel_m = np.linalg.norm(hm @ X - A @ X) / np.linalg.norm(A @ X)
    print(f"matmat rel err {rel_m:.2e}")
    assert rel_m < EPSILON

    # --- hierarchical direct solve ---
    # factorization is in place: factor a copy, keep hm for products
    factor = copy.deepcopy(hm)
    factor.lu_factorization()
    b = hm * x
    x_sol = factor.lu_solve("N", b)
    rel_lu = np.linalg.norm(x_sol - x) / np.linalg.norm(x)
    print(f"H-LU solve rel err {rel_lu:.2e}")
    assert rel_lu < 10 * EPSILON

    # --- observability ---
    info = hm.get_local_information()
    print("compression ratio:", info["Compression_ratio"])
    print("rank range:", info["Min_rank"], "-", info["Max_rank"])
    print(hm.get_tree_parameters())

    fig = plt.figure(figsize=(9, 4.5))
    ax1 = fig.add_subplot(1, 2, 1, projection="3d")
    ax2 = fig.add_subplot(1, 2, 2)
    ax1.set_title("cluster, depth 2")
    ax2.set_title("block structure (ranks)")
    Htool.plot(ax1, cluster, points, 2)
    Htool.plot(ax2, hm)
    finish_plot(fig, "use_hmatrix")


if __name__ == "__main__":
    main()
