"""Hermitian ('H') symmetry end-to-end: build, products (N/T/C), mirror
storage, distributed block rows, the sharded SPMD path, and a DDM solve.

Restores the 'H' axis of the reference's symmetry x UPLO test matrix
(reference: HMatrixTreeBuilder ctor symmetry in {N,S,H},
src/htool/hmatrix/hmatrix_tree_builder.hpp:23; Complex* class
instantiations, main.cpp:89-111).  The kernel exp(i w (x0-y0))/(0.1+|x-y|)
is smooth (compressible) and hermitian but NOT complex-symmetric, so any
mirror that transposes without conjugating fails these asserts.
"""

import copy

import numpy as np
import pytest

import htool_python_tpu as H
from htool_python_tpu.models.kernels import hermitian_phase_kernel

WAVE = 2.0


def _dense_hermitian(points):
    x0 = points[0]
    d = np.linalg.norm(points[:, :, None] - points[:, None, :], axis=0)
    A = np.exp(1j * WAVE * (x0[:, None] - x0[None, :])) / (1e-1 + d)
    assert np.allclose(A, A.conj().T)
    return A


@pytest.fixture(scope="module")
def hproblem():
    np.random.seed(7)
    n = 400
    pts = np.random.random((3, n))
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(20)
    cluster = builder.create_cluster_tree(pts, 2, size_of_partition=4)
    gen = H.KernelGenerator(hermitian_phase_kernel(WAVE), pts, pts,
                            is_complex=True)
    return n, cluster, gen, _dense_hermitian(pts)


@pytest.mark.parametrize("UPLO", ["L", "U"])
def test_hermitian_build_and_products(hproblem, UPLO):
    n, cluster, gen, A = hproblem
    eps = 1e-4
    hb = H.HMatrixTreeBuilder(eps, 10.0, "H", UPLO)
    h = hb.build(gen, cluster, cluster)
    assert np.iscomplexobj(np.asarray(h.to_dense()))

    np.random.seed(0)
    x = np.random.rand(n) + 1j * np.random.rand(n)
    for trans, ref in (("N", A @ x), ("T", A.T @ x), ("C", A.conj().T @ x)):
        y = np.asarray(h.matvec(x, trans))
        assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < eps, trans

    # densified self-consistency (oracle pattern #2)
    Ad = h.to_dense_in_user_numbering()
    assert np.linalg.norm(Ad @ x - np.asarray(h * x)) <= 1e-10 * np.linalg.norm(x)
    # hermitian storage really is hermitian
    assert np.allclose(Ad, Ad.conj().T)
    # multi-RHS
    X = np.random.rand(n, 3) + 1j * np.random.rand(n, 3)
    assert (np.linalg.norm(h @ X - A @ X) / np.linalg.norm(A @ X)) < eps


def test_hermitian_block_row_distributed(hproblem):
    n, cluster, gen, A = hproblem
    eps = 1e-4
    hb = H.HMatrixTreeBuilder(eps, 10.0, "H", "L")
    holder = H.DefaultApproximationBuilder(gen, cluster, cluster, hb)
    np.random.seed(1)
    x = np.random.rand(n) + 1j * np.random.rand(n)
    y = holder.distributed_operator * x
    ref = A @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < eps
    # at least one block row stores mirrors (one-triangle diagonal blocks)
    assert any(b.mirror.any()
               for h in holder.hmatrix
               for b in h.plan.dense_buckets + h.plan.lowrank_buckets)


def test_hermitian_sharded(hproblem):
    from htool_python_tpu.parallel.sharded import (
        ShardedDistributedOperator,
        make_mesh,
    )
    n, cluster, gen, A = hproblem
    eps = 1e-4
    hb = H.HMatrixTreeBuilder(eps, 10.0, "H", "L")
    holder = H.DefaultApproximationBuilder(gen, cluster, cluster, hb)
    sharded = ShardedDistributedOperator(holder.hmatrix, cluster, cluster,
                                         make_mesh(4))
    np.random.seed(2)
    x = np.random.rand(n) + 1j * np.random.rand(n)
    y_ref = holder.distributed_operator * x
    assert (np.linalg.norm(sharded * x - y_ref)
            / np.linalg.norm(y_ref) < 1e-12)
    for trans, ref in (("T", A.T @ x), ("C", A.conj().T @ x)):
        y = sharded.matvec_global(x, trans=trans)
        assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < eps, trans


def test_hermitian_ddm_solve(hproblem):
    n, cluster, gen, A = hproblem
    eps = 1e-6
    hb = H.HMatrixTreeBuilder(eps, 10.0, "H", "L")
    # diagonally-dominated hermitian system => GMRES converges fast
    holder = H.DefaultApproximationBuilder(gen, cluster, cluster, hb)
    bd = copy.deepcopy(holder.block_diagonal_hmatrix)
    solver = H.DDMSolverBuilder(holder.distributed_operator, bd).solver
    solver.set_hpddm_args("-hpddm_schwarz_method asm -hpddm_tol 1e-8 "
                          "-hpddm_max_it 200")
    solver.facto_one_level()
    np.random.seed(3)
    x_ref = np.random.rand(n) + 1j * np.random.rand(n)
    b = holder.distributed_operator * x_ref
    x = np.zeros(n, dtype=np.complex128)
    solver.solve(x, b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-5, solver.get_information()
