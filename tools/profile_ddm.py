"""Attribute the ddm_gmres stage's per-iteration cost (VERDICT r04 #3).

Builds the bench's N=20000 P=4 ASM config, then separates:
  * solver-surface rebuild cost (build_device_apply + preconditioner state)
  * GMRES cycle build cost (_make_gmres_cycle: trace + compile/cache-load)
  * pure cycle EXECUTION cost (same compiled cycle, fresh rhs)
Run alone (one TPU process).  Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import htool_python_tpu as H
    from htool_python_tpu.clustering.cluster import ClusterTreeBuilder
    from htool_python_tpu.hmatrix.generator import KernelGenerator
    from htool_python_tpu.hmatrix.hmatrix import HMatrixTreeBuilder
    from htool_python_tpu.models.kernels import inverse_distance_kernel
    from htool_python_tpu.models.geometry import (
        create_random_points_in_sphere)
    from htool_python_tpu.parallel.builders import DefaultApproximationBuilder
    from htool_python_tpu.solvers import krylov

    out = {}
    t0 = time.perf_counter()
    float(jnp.sum(jnp.zeros(8)))
    out["session_setup_s"] = round(time.perf_counter() - t0, 1)

    N, P, tol = 20000, 4, 1e-6
    np.random.seed(1)
    points = create_random_points_in_sphere(N)
    cb = ClusterTreeBuilder()
    cb.set_maximal_leaf_size(128)
    cluster = cb.create_cluster_tree(points, 2, size_of_partition=P)
    gen = KernelGenerator(inverse_distance_kernel(1e-1), points, points)
    hb = HMatrixTreeBuilder(1e-4, 10.0, "N", "N")
    hb.set_dtype(np.float32)
    t0 = time.perf_counter()
    approx = DefaultApproximationBuilder(gen, cluster, cluster, hb, None)
    builder = H.DDMSolverBuilder(approx.distributed_operator,
                                 approx.block_diagonal_hmatrix)
    solver = builder.solver
    solver.set_hpddm_args(
        "-hpddm_krylov_method gmres -hpddm_schwarz_method asm "
        f"-hpddm_max_it 300 -hpddm_gmres_restart 60 -hpddm_tol {tol}")
    solver.facto_one_level()
    out["setup_s"] = round(time.perf_counter() - t0, 1)

    A = approx.distributed_operator

    # --- surface rebuild costs ---
    t0 = time.perf_counter()
    A_fn = A.build_device_apply()
    out["build_device_apply_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    M_fn = solver._device_preconditioner()
    out["preconditioner_state_s"] = round(time.perf_counter() - t0, 3)

    x_ref = np.random.rand(N).astype(np.float32)
    b = np.asarray(A * x_ref)
    b2 = jnp.asarray(b[:, None])
    bnorm = krylov._cols_norm(b2)

    # --- cycle build (trace + compile/cache-load) vs execution ---
    restart, max_it = 60, 300
    t0 = time.perf_counter()
    cycle = krylov._make_gmres_cycle(A_fn, M_fn, restart, max_it)
    out["make_cycle_s"] = round(time.perf_counter() - t0, 3)
    _, a_ops = krylov._bind_operator(A_fn)
    _, m_ops = krylov._bind_operator(M_fn)
    x0 = jnp.zeros_like(b2)
    conv = jnp.zeros((1,), bool)
    nit = jnp.zeros((1,), jnp.int32)
    tol_arr = jnp.asarray(tol, bnorm.dtype)

    t0 = time.perf_counter()
    r1 = cycle(a_ops, m_ops, x0, b2, bnorm, conv, nit,
               jnp.asarray(0, jnp.int32), tol_arr)
    jax.block_until_ready(r1)
    out["cycle1_compile_plus_exec_s"] = round(time.perf_counter() - t0, 3)
    out["cycle1_niter"] = int(np.max(np.asarray(r1[2])))

    # same compiled cycle, fresh rhs: pure execution
    x_ref2 = np.random.rand(N).astype(np.float32)
    b2b = jnp.asarray(np.asarray(A * x_ref2)[:, None])
    bnorm2 = krylov._cols_norm(b2b)
    t0 = time.perf_counter()
    r2 = cycle(a_ops, m_ops, x0, b2b, bnorm2, conv, nit,
               jnp.asarray(0, jnp.int32), tol_arr)
    jax.block_until_ready(r2)
    out["cycle_exec_s"] = round(time.perf_counter() - t0, 3)
    n2 = int(np.max(np.asarray(r2[2])))
    out["cycle_exec_niter"] = n2
    out["cycle_exec_ms_per_it"] = round(out["cycle_exec_s"] * 1e3
                                        / max(n2, 1), 1)

    # rebuilt cycle closure (what a second solve() call used to pay):
    t0 = time.perf_counter()
    cycle2 = krylov._make_gmres_cycle(A_fn, M_fn, restart, max_it)
    r3 = cycle2(a_ops, m_ops, x0, b2b, bnorm2, conv, nit,
                jnp.asarray(0, jnp.int32), tol_arr)
    jax.block_until_ready(r3)
    out["rebuilt_cycle_exec_s"] = round(time.perf_counter() - t0, 3)

    # full solve() through the public surface, warm
    x = np.zeros(N, np.float32)
    t0 = time.perf_counter()
    solver.solve(x, b)
    out["solve1_s"] = round(time.perf_counter() - t0, 2)
    x2 = np.zeros(N, np.float32)
    t0 = time.perf_counter()
    solver.solve(x2, b)
    out["solve2_s"] = round(time.perf_counter() - t0, 2)
    it2 = int(solver.get_information()["Nb_it"])
    out["solve2_ms_per_it"] = round(out["solve2_s"] * 1e3 / max(it2, 1), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
