"""Large-subdomain coverage for the two verdict-r03 scale gaps:

* DDM H-LU local-solver tier: subdomains >= 8k dofs must be factorized
  hierarchically — no dense (m, m) subdomain matrix is ever materialized
  (reference `DDM<T, HPDDMCustomLocalSolver>`, solver/solver.hpp:16).
* `lu_factorization` beyond toy sizes: N >= 32768 surface cloud factorizes
  with the hierarchical (HODLR) path — the dense fallback must NOT fire —
  and solves to < epsilon (reference contract tests/test_hmatrix.py:98-128).
"""

import copy

import numpy as np

import htool_python_tpu as H
from htool_python_tpu.models.geometry import create_random_points_on_sphere
from htool_python_tpu.models.kernels import second_kind_kernel
from htool_python_tpu.parallel.builders import DefaultApproximationBuilder


def test_ddm_hier_local_solver_8k_subdomains():
    """Block-Jacobi DDM with two ~8k-dof subdomains: the local solves go
    through the hierarchical tier (no dense subdomain matrices), and the
    preconditioned GMRES still reaches tol 1e-6."""
    N, P = 16384, 2
    rng = np.random.RandomState(5)
    points = create_random_points_on_sphere(N, rng)
    cb = H.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(64)
    cluster = cb.create_cluster_tree(points, 2, size_of_partition=P)
    gen = H.KernelGenerator(second_kind_kernel(0.5, 10.0), points, points)
    hb = H.HMatrixTreeBuilder(1e-4, 10.0, "N", "N")
    hb.set_dtype(np.float32)
    approx = DefaultApproximationBuilder(gen, cluster, cluster, hb, None)
    builder = H.DDMSolverBuilder(approx.distributed_operator,
                                 approx.block_diagonal_hmatrix)
    solver = builder.solver
    for s in solver.subdomains:
        assert s.size >= 8000
        assert s.local_matrix is None, "subdomain densified at build time"
    solver.set_hpddm_args(
        "-hpddm_schwarz_method asm -hpddm_tol 1e-6 -hpddm_max_it 200 "
        "-hpddm_gmres_restart 60")
    solver.facto_one_level()
    # both subdomains are above hodlr_threshold: hierarchical tier only
    assert solver._facto is None, "large subdomains fell into the dense tier"
    assert len(solver._hier) == P
    for h in solver._hier:
        assert h["solver"].kind == "hodlr", (
            "hierarchical factorization fell back to dense LU")
    for s in solver.subdomains:
        assert s.local_matrix is None, "facto_one_level densified a subdomain"

    x_ref = rng.rand(N).astype(np.float32)
    f = np.asarray(approx.distributed_operator * x_ref)
    x = np.zeros(N, dtype=np.float32)
    solver.solve(x, f)
    res = (np.linalg.norm(approx.distributed_operator * x - f)
           / np.linalg.norm(f))
    assert res < 1e-5, f"residual {res:.3e}"
    info = solver.get_information()
    assert int(info["Nb_it"]) < 200


def test_lu_factorization_32k_no_dense_fallback():
    """lu_factorization at N = 32768 must stay hierarchical and solve to
    < epsilon (scaled): the dense O(N^2) fallback is asserted NOT to run."""
    N = 32768
    eps = 1e-3
    rng = np.random.RandomState(11)
    points = create_random_points_on_sphere(N, rng)
    cb = H.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(64)
    cluster = cb.create_cluster_tree(points, 2)
    # the identity part must scale with N to keep cond O(1) — the smooth
    # kernel's row sums grow ~N (quadrature-unweighted), and an f32
    # eps-accurate factorization can never solve below cond * eps
    gen = H.KernelGenerator(second_kind_kernel(0.5, 0.5 * N), points, points)
    hb = H.HMatrixTreeBuilder(eps, 10.0, "N", "N")
    hb.set_dtype(np.float32)
    hm = hb.build(gen, cluster, cluster)

    fac = copy.deepcopy(hm)
    fac.lu_factorization()
    assert fac._factorization[0] == "hodlr", (
        "dense fallback fired at N=32768")

    x_ref = rng.rand(N).astype(np.float32)
    b = hm * x_ref
    x = fac.lu_solve("N", b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    res = np.linalg.norm(hm * x - b) / np.linalg.norm(b)
    assert res < eps, f"factorization residual {res:.3e}"
    assert err < 10 * eps, f"solution error {err:.3e}"
