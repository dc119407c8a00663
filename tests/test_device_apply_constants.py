"""Regression guard: device-apply programs must not embed H-matrix data
as HLO constants.

Round-3 failure mode: `DistributedOperator.build_device_apply` closed over
every partition's bucket arrays, so outer jits (the GMRES restart cycle,
bench chains) baked hundreds of MB of block data into the compiled program
— `HTTP 413` on the remote-compile tunnel and `RESOURCE_EXHAUSTED` on
chip.  The fix is the `operands` protocol (solvers/krylov.py
`_bind_operator`): device state rides as jit ARGUMENTS.  These tests pin
that the traced programs carry only O(KB) of constants.
"""

import numpy as np

import jax
import jax.numpy as jnp

import htool_python_tpu as H
from htool_python_tpu.models.kernels import inverse_distance_kernel
from htool_python_tpu.parallel.builders import DefaultApproximationBuilder

# generous bound: permutations and small index arrays may legitimately be
# folded in, but bucket/factor data (MBs) must not
_CONST_BUDGET_BYTES = 200_000


def _const_bytes(closed_jaxpr):
    return sum(np.asarray(c).nbytes for c in closed_jaxpr.consts)


def _build_operator(n=600, partitions=2):
    np.random.seed(7)
    points = np.random.rand(3, n)
    cb = H.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(40)
    cluster = cb.create_cluster_tree(points, 2, size_of_partition=partitions)

    gen = H.KernelGenerator(inverse_distance_kernel(0.1), points, points)
    hb = H.HMatrixTreeBuilder(1e-3, 10.0, "N", "N")
    hb.set_dtype(np.float64)
    return DefaultApproximationBuilder(gen, cluster, cluster, hb, None), points


def test_distributed_device_apply_constants_are_small():
    approx, points = _build_operator()
    A = approx.distributed_operator
    fn = A.build_device_apply()
    assert hasattr(fn, "operands"), "device apply must expose operands"
    x = jnp.zeros((A.shape[1], 1))
    closed = jax.make_jaxpr(fn)(fn.operands, x)
    nbytes = _const_bytes(closed)
    assert nbytes < _CONST_BUDGET_BYTES, (
        f"device apply traced {nbytes} bytes of constants — H-matrix data "
        "is leaking into the compiled program instead of riding operands")


def test_distributed_device_apply_matches_host_path():
    approx, points = _build_operator()
    A = approx.distributed_operator
    fn = A.build_device_apply()
    x = np.random.rand(A.shape[1], 2)
    y_host = A.matvec_global(x)
    y_dev2 = np.asarray(fn(fn.operands, jnp.asarray(x)))
    y_dev1 = np.asarray(fn(jnp.asarray(x)))  # closure form still works
    assert np.linalg.norm(y_dev2 - y_host) / np.linalg.norm(y_host) < 1e-10
    assert np.linalg.norm(y_dev1 - y_host) / np.linalg.norm(y_host) < 1e-10


def test_ddm_preconditioner_constants_are_small():
    approx, points = _build_operator()
    A = approx.distributed_operator
    builder = H.DDMSolverBuilder(A, approx.block_diagonal_hmatrix)
    solver = builder.solver
    solver.set_hpddm_args("-hpddm_schwarz_method asm")
    solver.facto_one_level()
    M = solver._device_preconditioner()
    assert M is not None and hasattr(M, "operands")
    r = jnp.zeros((A.shape[0], 1))
    closed = jax.make_jaxpr(M)(M.operands, r)
    nbytes = _const_bytes(closed)
    assert nbytes < _CONST_BUDGET_BYTES, (
        f"preconditioner traced {nbytes} bytes of constants")


def test_gmres_cycle_constants_are_small():
    """The end-to-end guard: trace the actual solver restart cycle with the
    operator and preconditioner bound and assert the whole program's
    constant footprint stays O(KB)."""
    from htool_python_tpu.solvers.krylov import (_bind_operator,
                                                 _make_gmres_cycle)

    approx, points = _build_operator()
    A = approx.distributed_operator
    builder = H.DDMSolverBuilder(A, approx.block_diagonal_hmatrix)
    solver = builder.solver
    solver.set_hpddm_args("-hpddm_schwarz_method asm")
    solver.facto_one_level()
    A_fn = A.build_device_apply()
    M_fn = solver._device_preconditioner()
    cycle = _make_gmres_cycle(A_fn, M_fn, m=5, max_it=20)
    _, a_ops = _bind_operator(A_fn)
    _, m_ops = _bind_operator(M_fn)
    n = A.shape[0]
    x = jnp.zeros((n, 1))
    b = jnp.ones((n, 1))
    bnorm = jnp.ones((1,))
    conv = jnp.zeros((1,), dtype=bool)
    niter = jnp.zeros((1,), jnp.int32)
    closed = jax.make_jaxpr(cycle)(
        a_ops, m_ops, x, b, bnorm, conv, niter,
        jnp.asarray(0, jnp.int32), jnp.asarray(1e-6))
    nbytes = _const_bytes(closed)
    assert nbytes < _CONST_BUDGET_BYTES, (
        f"GMRES cycle traced {nbytes} bytes of constants")
