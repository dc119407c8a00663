"""Multi-host dryrun: N localhost processes, each with K virtual CPU
devices, run the sharded distributed operator over BOTH the global 1-D
mesh and the hybrid (hosts x per-host-devices) mesh, solve a DDM
block-Jacobi-preconditioned GMRES system to the requested tolerance, and
record a 1-process vs N-process scaling proxy.

This validates the `jax.distributed` path (the TPU-pod analog of the
reference's `mpirun -np N` test matrix, SURVEY.md §4 /
/root/reference/.github/workflows/CI.yml:130-143) without pod hardware:

    python tools/multihost_dryrun.py               # launcher: spawns workers
    # exit 0 iff every process passed; writes MULTIHOST_SCALING.json

Env (worker mode, set by the launcher): MH_ROLE=worker, JAX_PROCESS_ID,
JAX_NUM_PROCESSES, JAX_COORDINATOR_ADDRESS, MH_DEVICES_PER_PROCESS.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

N_PROCESSES = int(os.environ.get("MH_PROCESSES", "2"))
DEVICES_PER_PROCESS = int(os.environ.get("MH_DEVICES_PER_PROCESS", "2"))
PORT = int(os.environ.get("MH_PORT", "39617"))
SCALING_REPS = int(os.environ.get("MH_SCALING_REPS", "20"))


def _build_problem(P, n, eps=1e-6, leaf=32, dtype=None):
    import numpy as np

    from htool_python_tpu.clustering.cluster import ClusterTreeBuilder
    from htool_python_tpu.hmatrix.generator import KernelGenerator
    from htool_python_tpu.hmatrix.hmatrix import HMatrixTreeBuilder
    from htool_python_tpu.models.kernels import inverse_distance_kernel
    from htool_python_tpu.parallel.builders import DefaultApproximationBuilder

    np.random.seed(0)  # identical geometry on every process (SPMD)
    points = np.random.random((3, n))
    cb = ClusterTreeBuilder()
    cb.set_maximal_leaf_size(leaf)
    cluster = cb.create_cluster_tree(points, 2, size_of_partition=P)
    gen = KernelGenerator(inverse_distance_kernel(1e-1), points, points)
    hb = HMatrixTreeBuilder(eps, 10.0, "N", "N")
    hb.set_dtype(dtype if dtype is not None else np.float64)
    approx = DefaultApproximationBuilder(gen, cluster, cluster, hb, None)
    return points, cluster, approx


def _block_jacobi_precond(mesh, sharded, approx, cluster, n):
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl
    import numpy as np

    from htool_python_tpu.parallel.sharded import sharded_block_solve

    perm = cluster.get_permutation()
    P = sharded.n_partitions
    m = max(int(s) for s in sharded.t_sizes)
    mats = np.zeros((P, m, m))
    idx = np.full((P, m), n, dtype=np.int64)
    weights = np.zeros((P, m))
    for p in range(P):
        o, s = int(sharded.t_offsets[p]), int(sharded.t_sizes[p])
        ids = perm[o:o + s]
        idx[p, :s] = ids
        weights[p, :s] = 1.0
        mats[p, :s, :s] = approx.block_diagonal_hmatrix[p].to_dense()
        mats[p, range(s, m), range(s, m)] = 1.0
    lu, piv = jsl.lu_factor(jnp.asarray(mats))
    return sharded_block_solve(mesh, lu, piv, idx, weights, n)


def worker() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", DEVICES_PER_PROCESS)

    from htool_python_tpu.parallel.multihost import (
        initialize_distributed,
        is_primary,
        make_global_mesh,
        make_hybrid_mesh,
    )

    if N_PROCESSES > 1:
        assert initialize_distributed(), "jax.distributed did not initialize"
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from htool_python_tpu.parallel.sharded import ShardedDistributedOperator
    from htool_python_tpu.solvers.krylov import gmres_device

    P = jax.device_count()  # global
    assert P == N_PROCESSES * DEVICES_PER_PROCESS, (P, N_PROCESSES)
    n = 64 * P
    points, cluster, approx = _build_problem(P, n)

    dense = 1.0 / (1e-1 + np.linalg.norm(
        points[:, :, None] - points[:, None, :], axis=0))
    x = np.random.RandomState(1).rand(n)
    results = {}
    for mesh_kind in ("global", "hybrid"):
        mesh = (make_global_mesh(P) if mesh_kind == "global"
                else make_hybrid_mesh(DEVICES_PER_PROCESS))
        sharded = ShardedDistributedOperator(approx.hmatrix, cluster,
                                             cluster, mesh)
        y = np.asarray(sharded * x)
        err = np.linalg.norm(y - dense @ x) / np.linalg.norm(dense @ x)
        assert err < 1e-6, (
            f"process {jax.process_index()} {mesh_kind}: err {err:.3e}")

        # DDM block-Jacobi-preconditioned solve to the REQUESTED tolerance
        tol = 1e-8
        precond = _block_jacobi_precond(mesh, sharded, approx, cluster, n)
        b = dense @ x
        x_sol, info = gmres_device(sharded.build_device_apply(),
                                   b, M_fn=precond.device_apply,
                                   tol=tol, max_it=300, restart=60)
        res = float(np.max(info["residual"]))
        assert res < tol, (
            f"process {jax.process_index()} {mesh_kind}: GMRES residual "
            f"{res:.3e} > tol {tol:g}")
        sol_err = np.linalg.norm(np.asarray(x_sol) - x) / np.linalg.norm(x)
        assert sol_err < 1e-4, f"{mesh_kind}: solution err {sol_err:.3e}"
        results[mesh_kind] = (err, res, int(np.max(info["niter"])), sol_err)

    # scaling proxy: per-process wall time of SCALING_REPS products at a
    # REALISTIC per-device problem size.  (The r03 proxy timed the small
    # correctness problem, n = 64 * P: at that size a product is a few
    # microseconds of compute and the measurement is pure multi-process
    # collective latency — an efficiency number about gRPC round-trips,
    # not about the operator mechanism.)
    import jax.numpy as jnp

    from htool_python_tpu.parallel.multihost import (make_global_mesh,
                                                     make_hybrid_mesh)

    n2 = int(os.environ.get("MH_SCALING_N", 4096 * P))
    _, cluster2, approx2 = _build_problem(P, n2, eps=1e-3, leaf=128,
                                          dtype=np.float32)
    x2 = np.random.RandomState(2).rand(n2, 1).astype(np.float32)
    for mesh_kind in ("global", "hybrid"):
        mesh = (make_global_mesh(P) if mesh_kind == "global"
                else make_hybrid_mesh(DEVICES_PER_PROCESS))
        sharded2 = ShardedDistributedOperator(approx2.hmatrix, cluster2,
                                              cluster2, mesh)
        fn = sharded2.build_device_apply()
        ops = fn.operands

        # device-resident rep chain (one dispatch), the shape Krylov loops
        # actually run in — per-call multi-process dispatch sync is not
        # part of the operator mechanism being measured
        @jax.jit
        def chain(ops, x):
            def body(i, x):
                y = fn(ops, x)
                return y * (1.0 / jnp.linalg.norm(y))
            return jax.lax.fori_loop(0, SCALING_REPS, body, x)

        xd = jnp.asarray(x2)
        jax.block_until_ready(chain(ops, xd))
        t0 = time.perf_counter()
        jax.block_until_ready(chain(ops, xd))
        results[mesh_kind + "_product_s"] = (
            (time.perf_counter() - t0) / SCALING_REPS)

    if is_primary():
        for k in ("global", "hybrid"):
            err, res, nit, sol_err = results[k]
            print(f"multihost dryrun [{k}] ok: {N_PROCESSES} x "
                  f"{DEVICES_PER_PROCESS} devices, product err {err:.3e}, "
                  f"GMRES res {res:.3e} in {nit} its (sol err {sol_err:.2e})"
                  f", product {results[k + '_product_s'] * 1e3:.2f} ms")
        out = os.environ.get("MH_RESULT_FILE")
        if out:
            with open(out, "w") as f:
                json.dump({k: results[k + "_product_s"]
                           for k in ("global", "hybrid")}, f)


def launcher() -> int:
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)

    def spawn(n_procs, dev_per_proc, result_file, port):
        procs = []
        for pid in range(n_procs):
            env = dict(env_base)
            env.update({
                "MH_ROLE": "worker",
                "MH_PROCESSES": str(n_procs),
                "MH_DEVICES_PER_PROCESS": str(dev_per_proc),
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": str(n_procs),
                "JAX_PROCESS_ID": str(pid),
                "MH_RESULT_FILE": result_file if pid == 0 else "",
            })
            procs.append(subprocess.Popen([sys.executable, __file__],
                                          env=env))
        rc = 0
        for p in procs:
            rc |= p.wait()
        return rc

    total = N_PROCESSES * DEVICES_PER_PROCESS
    # baseline: ONE process holding every device (same global problem)
    rc = spawn(1, total, "/tmp/mh_scaling_1p.json", PORT + 1)
    if rc:
        return rc
    rc = spawn(N_PROCESSES, DEVICES_PER_PROCESS, "/tmp/mh_scaling_np.json",
               PORT)
    if rc:
        return rc
    try:
        with open("/tmp/mh_scaling_1p.json") as f:
            t1 = json.load(f)
        with open("/tmp/mh_scaling_np.json") as f:
            tn = json.load(f)
        scaling = {k: {"t_1proc_ms": t1[k] * 1e3,
                       "t_nproc_ms": tn[k] * 1e3,
                       "per_process_efficiency": t1[k] / tn[k]}
                   for k in t1}
        total_devs = N_PROCESSES * DEVICES_PER_PROCESS
        scaling_n = int(os.environ.get("MH_SCALING_N", 4096 * total_devs))
        entry = {"processes": N_PROCESSES,
                 "devices_per_process": DEVICES_PER_PROCESS,
                 "scaling_n": scaling_n,
                 "scaling_reps": SCALING_REPS,
                 "scaling_proxy": scaling}
        # KEYED record per configuration (round-5 fix: every run used to
        # overwrite the whole file, so the amortized large-N measurement
        # the README cites never survived the next small-N dryrun)
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MULTIHOST_SCALING.json")
        report = {"note": ("virtual CPU devices on one machine: a "
                           "MECHANISM proxy (collective paths + "
                           "distributed runtime), not real DCN/ICI "
                           "performance"),
                  "runs": {}}
        try:
            with open(path) as f:
                prev = json.load(f)
            if isinstance(prev.get("runs"), dict):
                report["runs"] = prev["runs"]
        except Exception:
            pass
        key = f"N{scaling_n}_P{N_PROCESSES}x{DEVICES_PER_PROCESS}"
        report["runs"][key] = entry
        with open(path, "w") as f:
            json.dump(report, f, indent=1)
        print("scaling proxy:", json.dumps(scaling))
    except Exception as e:  # pragma: no cover
        print("scaling report failed:", e)
    return 0


if __name__ == "__main__":
    if os.environ.get("MH_ROLE") == "worker":
        worker()
    else:
        sys.exit(launcher())
