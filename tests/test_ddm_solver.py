"""DDM solver tests (parity with reference tests/test_ddm_solver.py):
golden-data oracle — GMRES converges to tol and matches the dense-solve
reference solution within 10*epsilon, across builder variants, Schwarz
methods, multi-RHS, and one-/two-level (GenEO) preconditioners."""

import copy

import numpy as np
import pytest
import scipy.linalg as sla

import htool_python_tpu as H
from conftest import GeneratorFromMatrix


class CustomDenseGeneoBuilder(H.VirtualGeneoCoarseSpaceDenseBuilder):
    """User dense GenEO hook (reference test_ddm_solver.py:14-34 parity)."""

    def compute_coarse_space(self, Ai, Bi):
        if self.symmetry in ("S", "H"):
            w, v = sla.eigh(Ai, Bi)
        else:
            w, v = sla.eig(Ai, Bi)
        idx = w.argsort()[::-1]
        if self.geneo_threshold > 0:
            nb_eig = int((w > self.geneo_threshold).sum())
        else:
            nb_eig = self.geneo_nu
        self.set_coarse_space(v[:, idx[:nb_eig]].real)


class CustomMatrixFreeGeneoBuilder(H.VirtualGeneoCoarseSpaceBuilder):
    """User matrix-free GenEO hook: applies the callback to the identity to
    exercise the overlap-zeroed H-matvec contract
    (reference: virtual_coarse_space_builder.hpp:26-53)."""

    def __init__(self, size_wo, size_with, Ai, Bi, geneo_nu=-1,
                 geneo_threshold=-1.0):
        super().__init__(size_wo, size_with, Ai, geneo_nu=geneo_nu,
                         geneo_threshold=geneo_threshold)
        self.Bi = np.asarray(Bi).real

    def compute_coarse_space(self, hmatrix_callback):
        m = self.size_with_overlap
        DAiD = np.zeros((m, m))
        eye = np.eye(m)
        for j in range(m):
            DAiD[:, j] = hmatrix_callback(eye[:, j])
        DAiD = 0.5 * (DAiD + DAiD.T)
        w, v = sla.eigh(DAiD, self.Bi)
        idx = w.argsort()[::-1]
        if self.geneo_threshold > 0:
            nb_eig = int((w > self.geneo_threshold).sum())
        else:
            nb_eig = self.geneo_nu
        self.set_coarse_space(v[:, idx[:nb_eig]])


def _build_solver(ddm_builder, default_approximation, generator, epsilon,
                  eta, symmetry, UPLO, ovr, c2o, neighbors, intersections,
                  geometry):
    op = default_approximation.distributed_operator
    if ddm_builder == "BlockJacobi":
        bd = copy.deepcopy(default_approximation.block_diagonal_hmatrix)
        return H.DDMSolverBuilder(op, bd)
    if ddm_builder == "BlockJacobiDense":
        return H.DDMSolverWithDenseLocalSolver(
            op, default_approximation.block_diagonal_hmatrix)
    if ddm_builder == "DDMWithHMatrixPlusOverlap":
        bd = copy.deepcopy(default_approximation.block_diagonal_hmatrix)
        return H.DDMSolverBuilder(op, bd, generator, ovr, c2o, neighbors,
                                  intersections)
    if ddm_builder == "DDMWithHMatrixPlusOverlapDense":
        return H.DDMSolverWithDenseLocalSolver(
            op, default_approximation.block_diagonal_hmatrix, generator,
            ovr, c2o, neighbors, intersections)
    if ddm_builder == "DDMWithHMatrix":
        b = H.DDMSolverBuilder(
            op, ovr, c2o, neighbors, intersections, generator, geometry,
            H.ClusterTreeBuilder(),
            H.HMatrixTreeBuilder(epsilon, eta, symmetry, UPLO),
            radii=None, weights=None)
        H.recompression(b.get_local_hmatrix())
        return b
    if ddm_builder == "DDMWithHMatrixDense":
        return H.DDMSolverWithDenseLocalSolver(
            op, ovr, c2o, neighbors, intersections, generator, geometry,
            H.HMatrixTreeBuilder(epsilon, eta, symmetry, UPLO))
    raise ValueError(ddm_builder)


@pytest.mark.parametrize("epsilon", [1e-6])
@pytest.mark.parametrize("eta", [10])
@pytest.mark.parametrize("tol", [1e-6])
@pytest.mark.parametrize("n_partitions", [1, 2, 3, 4])
@pytest.mark.parametrize(
    "mu,symmetry,ddm_builder,schwarz_method,coarse_correction,geneo_type",
    [
        (1, "N", "BlockJacobi", "none", "none", "none"),
        (1, "N", "BlockJacobi", "asm", "none", "none"),
        (1, "N", "BlockJacobi", "ras", "none", "none"),
        (1, "N", "BlockJacobiDense", "none", "none", "none"),
        (1, "N", "BlockJacobiDense", "asm", "none", "none"),
        (1, "N", "BlockJacobiDense", "ras", "none", "none"),
        (1, "N", "DDMWithHMatrixPlusOverlap", "asm", "none", "none"),
        (1, "N", "DDMWithHMatrixPlusOverlap", "ras", "none", "none"),
        (1, "N", "DDMWithHMatrix", "asm", "none", "none"),
        (1, "N", "DDMWithHMatrix", "ras", "none", "none"),
        (1, "N", "DDMWithHMatrixDense", "asm", "none", "none"),
        (1, "N", "DDMWithHMatrixPlusOverlapDense", "ras", "none", "none"),
        (10, "N", "BlockJacobi", "ras", "none", "none"),
        (10, "N", "DDMWithHMatrixPlusOverlap", "asm", "none", "none"),
        (1, "S", "BlockJacobi", "none", "none", "none"),
        (1, "S", "BlockJacobi", "asm", "none", "none"),
        (1, "S", "BlockJacobi", "ras", "none", "none"),
        (1, "S", "DDMWithHMatrixPlusOverlap", "asm", "none", "none"),
        (1, "S", "DDMWithHMatrixPlusOverlap", "ras", "none", "none"),
        (1, "S", "DDMWithHMatrix", "asm", "none", "none"),
        (1, "S", "DDMWithHMatrix", "ras", "none", "none"),
        (1, "S", "DDMWithHMatrixPlusOverlapDense", "asm", "none", "none"),
        (1, "S", "DDMWithHMatrixDense", "ras", "none", "none"),
        (10, "S", "BlockJacobi", "ras", "none", "none"),
        (10, "S", "DDMWithHMatrixPlusOverlap", "asm", "none", "none"),
        (1, "S", "DDMWithHMatrixPlusOverlap", "asm", "additive", "geneo_nu"),
        (1, "S", "DDMWithHMatrixPlusOverlap", "ras", "additive", "geneo_nu"),
        (10, "S", "DDMWithHMatrixPlusOverlap", "ras", "additive", "geneo_nu"),
        (1, "S", "DDMWithHMatrixPlusOverlap", "ras", "additive",
         "geneo_threshold"),
        (1, "S", "DDMWithHMatrixPlusOverlap", "asm", "additive",
         "custom_dense_geneo_nu"),
        (1, "S", "DDMWithHMatrixPlusOverlap", "ras", "additive",
         "custom_dense_geneo_threshold"),
        (1, "S", "DDMWithHMatrix", "asm", "additive", "geneo_nu"),
        (1, "S", "DDMWithHMatrix", "ras", "additive", "custom_geneo_nu"),
        (10, "S", "DDMWithHMatrix", "asm", "additive", "custom_geneo_nu"),
    ],
)
def test_ddm_solver(load_data_solver, epsilon, eta, mu, ddm_builder,
                    symmetry, tol, schwarz_method, coarse_correction,
                    geneo_type, n_partitions):
    [A, x_ref, f, geometry, cluster, neighbors, intersections, symmetry,
     UPLO, cluster_to_ovr, ovr_to_global, Ki] = load_data_solver

    generator = GeneratorFromMatrix(A)
    default_approximation = H.DefaultApproximationBuilder(
        generator, cluster, cluster,
        H.HMatrixTreeBuilder(epsilon, eta, symmetry, UPLO), None)
    H.recompression(default_approximation.hmatrix)

    builder = _build_solver(ddm_builder, default_approximation, generator,
                            epsilon, eta, symmetry, UPLO, ovr_to_global,
                            cluster_to_ovr, neighbors, intersections,
                            geometry)
    solver = builder.solver
    distributed_operator = default_approximation.distributed_operator

    dtype = "complex128" if symmetry != "S" else "float64"
    x = np.zeros(len(f) if f.ndim == 1 else f.shape, dtype=dtype, order="F")
    restart = "" if symmetry == "S" else " -hpddm_gmres_restart 200 "
    solver.set_hpddm_args(
        "-hpddm_krylov_method gmres" + restart
        + " -hpddm_schwarz_method " + schwarz_method
        + " -hpddm_max_it 200 -hpddm_variant right -hpddm_tol " + str(tol))

    if coarse_correction != "none" and n_partitions > 1:
        space_builders = []
        for p in range(n_partitions):
            wo = len(cluster_to_ovr[p])
            wth = len(ovr_to_global[p])
            bd = default_approximation.block_diagonal_hmatrix[p]
            if geneo_type == "geneo_nu":
                sb = H.GeneoCoarseSpaceDenseBuilder(
                    wo, wth, bd, Ki[p], symmetry, UPLO, geneo_nu=2)
            elif geneo_type == "geneo_threshold":
                sb = H.GeneoCoarseSpaceDenseBuilder(
                    wo, wth, bd, Ki[p], symmetry, UPLO, geneo_threshold=0.1)
            elif geneo_type == "custom_dense_geneo_nu":
                sb = CustomDenseGeneoBuilder(
                    wo, wth, bd.to_dense(), Ki[p], symmetry, UPLO, geneo_nu=2)
            elif geneo_type == "custom_dense_geneo_threshold":
                sb = CustomDenseGeneoBuilder(
                    wo, wth, bd.to_dense(), Ki[p], symmetry, UPLO,
                    geneo_threshold=0.1)
            elif geneo_type == "custom_geneo_nu":
                local_h = (builder.get_local_hmatrix()[p]
                           if ddm_builder == "DDMWithHMatrix" else bd)
                sb = CustomMatrixFreeGeneoBuilder(wo, wth, local_h, Ki[p],
                                                  geneo_nu=2)
            else:
                raise ValueError(geneo_type)
            space_builders.append(sb)
        coarse_op_builder = H.GeneoCoarseOperatorBuilder(distributed_operator)
        solver.build_coarse_space(space_builders, coarse_op_builder)
        solver.set_hpddm_args(
            "-hpddm_schwarz_coarse_correction " + coarse_correction)

    if schwarz_method in ("asm", "ras"):
        solver.facto_one_level()

    solver.solve(x, f)

    if mu == 1:
        convergence_error = (np.linalg.norm(distributed_operator * x - f)
                             / np.linalg.norm(f))
        solution_error = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    else:
        convergence_error = (np.linalg.norm(distributed_operator @ x - f)
                             / np.linalg.norm(f))
        solution_error = (np.linalg.norm(x[:, 1] - x_ref)
                          / np.linalg.norm(x_ref))

    print(solver.get_information())
    assert convergence_error < tol
    assert solution_error < epsilon * 10


@pytest.mark.parametrize("epsilon", [1e-6])
@pytest.mark.parametrize("tol", [1e-6])
@pytest.mark.parametrize("n_partitions", [1, 2, 4])
@pytest.mark.parametrize("mu,symmetry,schwarz_method",
                         [(1, "S", "asm"), (1, "N", "ras"), (10, "S", "ras")])
def test_ddm_solver_left_variant(load_data_solver, epsilon, tol, mu,
                                 symmetry, schwarz_method, n_partitions):
    """'-hpddm_variant left' (reference surface:
    tests/test_ddm_solver.py:548-558): left-preconditioned GMRES solves
    M^{-1}A x = M^{-1}b; the solution must still meet the TRUE-residual
    and golden-solution contracts."""
    [A, x_ref, f, geometry, cluster, neighbors, intersections, symmetry,
     UPLO, cluster_to_ovr, ovr_to_global, Ki] = load_data_solver

    generator = GeneratorFromMatrix(A)
    default_approximation = H.DefaultApproximationBuilder(
        generator, cluster, cluster,
        H.HMatrixTreeBuilder(epsilon, 10, symmetry, UPLO), None)
    builder = H.DDMSolverBuilder(
        default_approximation.distributed_operator,
        copy.deepcopy(default_approximation.block_diagonal_hmatrix))
    solver = builder.solver
    distributed_operator = default_approximation.distributed_operator

    dtype = "complex128" if symmetry != "S" else "float64"
    x = np.zeros(len(f) if f.ndim == 1 else f.shape, dtype=dtype, order="F")
    restart = "" if symmetry == "S" else " -hpddm_gmres_restart 200 "
    solver.set_hpddm_args(
        "-hpddm_krylov_method gmres" + restart
        + " -hpddm_schwarz_method " + schwarz_method
        + " -hpddm_max_it 200 -hpddm_variant left -hpddm_tol " + str(tol))
    solver.facto_one_level()
    solver.solve(x, f)

    convergence_error = (np.linalg.norm(
        (distributed_operator @ x if mu > 1 else distributed_operator * x)
        - f) / np.linalg.norm(f))
    xs = x[:, 1] if mu > 1 else x
    solution_error = np.linalg.norm(xs - x_ref) / np.linalg.norm(x_ref)
    assert convergence_error < 10 * tol  # tol applies to the M^{-1} residual
    assert solution_error < epsilon * 10


def test_coarse_operator_device_matches_host():
    """GeneoCoarseOperatorBuilder routes E = Z^H A Z through the blocked
    device apply when all local operators are device-backed (r04 weak #5:
    the host path applies partitions sequentially per column block); the
    result must match the host matvec_global path to solver accuracy."""
    from htool_python_tpu.models.kernels import inverse_distance_kernel

    n = 600
    rng = np.random.default_rng(3)
    pts = rng.random((3, n))
    cb = H.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(64)
    cluster = cb.create_cluster_tree(pts, 2, size_of_partition=2)
    gen = H.KernelGenerator(inverse_distance_kernel(0.5), pts, pts)
    approx = H.DefaultApproximationBuilder(
        gen, cluster, cluster, H.HMatrixTreeBuilder(1e-6, 10.0, "N", "N"),
        None)
    dop = approx.distributed_operator
    assert dop.device_apply_available()
    Z = rng.standard_normal((n, 7))
    builder = H.GeneoCoarseOperatorBuilder(dop)
    E_dev = builder.build_coarse_operator(Z)
    AZ_host = dop.matvec_global(np.asarray(Z, order="F"))
    E_host = Z.conj().T @ AZ_host
    assert E_dev.shape == (7, 7)
    err = np.linalg.norm(E_dev - E_host) / np.linalg.norm(E_host)
    assert err < 1e-6
