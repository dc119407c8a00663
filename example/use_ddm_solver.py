"""Domain-decomposition-preconditioned Krylov solve, device-resident.

The preconditioner factorizes every subdomain at once: small subdomains in
one batched padded LU, large H-matrix subdomains hierarchically (H-LU
tier).  The restarted GMRES cycle — operator apply, Schwarz solve,
orthogonalization, Givens updates — compiles into a single device program
with all right-hand sides marching in lockstep; the host reads back only
convergence flags per restart.

Porting from Htool: `DDMSolverBuilder(distributed_operator,
block_diagonal_hmatrix)` = block-Jacobi variant 1;
`solver.set_hpddm_args("-hpddm_*")` strings port verbatim (the framework
parses the same flags HPDDM does); `facto_one_level`, `solve(x, b)`
in-place, `get_information` match example/use_ddm_solver.py.
"""

import matplotlib.pyplot as plt
import numpy as np

from _example_env import finish_plot, n_partitions  # noqa: I001

import htool_python_tpu as Htool
from htool_python_tpu.models.geometry import create_random_points_in_sphere
from htool_python_tpu.models.kernels import inverse_distance_kernel

EPSILON = 1e-3
TOL = 1e-6


def build_problem(P, n=1200):
    points = create_random_points_in_sphere(n)
    cb = Htool.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(32)
    cluster = cb.create_cluster_tree(points, 2, size_of_partition=P)
    gen = Htool.KernelGenerator(inverse_distance_kernel(0.1), points, points)
    hb = Htool.HMatrixTreeBuilder(EPSILON, 10.0, "S", "L")
    approx = Htool.DefaultApproximationBuilder(gen, cluster, cluster, hb,
                                               None)
    return points, cluster, approx


def main():
    P = n_partitions(2)
    np.random.seed(0)
    points, cluster, approx = build_problem(P)
    op = approx.distributed_operator
    n = op.shape[0]

    Htool.recompression(approx.hmatrix)

    # one-level additive Schwarz from the partition-diagonal blocks
    builder = Htool.DDMSolverBuilder(op, approx.block_diagonal_hmatrix)
    solver = builder.solver
    solver.set_hpddm_args(
        f"-hpddm_krylov_method gmres -hpddm_schwarz_method asm "
        f"-hpddm_tol {TOL} -hpddm_max_it 200 -hpddm_gmres_restart 40 "
        f"-hpddm_compute_residual l2")
    solver.facto_one_level()

    # manufactured solution; solve writes into x in place
    x_exact = np.random.rand(n)
    b = op * x_exact
    x = np.zeros(n)
    solver.solve(x, b)

    rel = np.linalg.norm(x - x_exact) / np.linalg.norm(x_exact)
    info = solver.get_information()
    print(f"converged in {info['Nb_it']} iterations, "
          f"residual {info['Relative_residual']}, solution err {rel:.2e}")
    assert rel < 10 * EPSILON

    # multiple right-hand sides march in lockstep in the same cycle
    B = np.stack([b, 2 * b], axis=1)
    X = np.zeros_like(B)
    solver.solve(X, B)
    assert np.linalg.norm(X[:, 1] - 2 * X[:, 0]) < 1e-4 * np.linalg.norm(X)

    print(op.get_distributed_information())

    fig = plt.figure(figsize=(9, 4.5))
    ax1 = fig.add_subplot(1, 2, 1, projection="3d")
    ax2 = fig.add_subplot(1, 2, 2)
    ax1.set_title(f"subdomains (P={P})")
    ax2.set_title("block-diagonal H-matrix, partition 0")
    Htool.plot(ax1, cluster, points, 1)
    Htool.plot(ax2, approx.block_diagonal_hmatrix[0])
    finish_plot(fig, "use_ddm_solver")


if __name__ == "__main__":
    main()
