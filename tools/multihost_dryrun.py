"""Multi-host dryrun: N localhost processes, each with K virtual CPU
devices, run the sharded distributed product over a global 1-D mesh and
check it against the dense oracle.

This validates the `jax.distributed` + global-mesh path (the TPU-pod
analog of the reference's `mpirun -np N` test matrix, SURVEY.md §4)
without TPU-pod hardware:

    python tools/multihost_dryrun.py               # launcher: spawns workers
    # exit 0 iff every process's product matched the oracle

Env (worker mode, set by the launcher): MH_ROLE=worker, JAX_PROCESS_ID,
JAX_NUM_PROCESSES, JAX_COORDINATOR_ADDRESS.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

N_PROCESSES = int(os.environ.get("MH_PROCESSES", "2"))
DEVICES_PER_PROCESS = int(os.environ.get("MH_DEVICES_PER_PROCESS", "2"))
PORT = int(os.environ.get("MH_PORT", "39617"))


def worker() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", DEVICES_PER_PROCESS)

    from htool_python_tpu.parallel.multihost import (
        initialize_distributed,
        is_primary,
        make_global_mesh,
    )

    assert initialize_distributed(), "jax.distributed did not initialize"
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from htool_python_tpu.clustering.cluster import ClusterTreeBuilder
    from htool_python_tpu.hmatrix.generator import KernelGenerator
    from htool_python_tpu.hmatrix.hmatrix import HMatrixTreeBuilder
    from htool_python_tpu.models.kernels import inverse_distance_kernel
    from htool_python_tpu.parallel.builders import DefaultApproximationBuilder
    from htool_python_tpu.parallel.sharded import ShardedDistributedOperator

    P = jax.device_count()  # global
    assert P == N_PROCESSES * DEVICES_PER_PROCESS, (P, N_PROCESSES)
    n = 64 * P
    np.random.seed(0)  # identical geometry on every process (SPMD)
    points = np.random.random((3, n))
    cb = ClusterTreeBuilder()
    cb.set_maximal_leaf_size(32)
    cluster = cb.create_cluster_tree(points, 2, size_of_partition=P)
    gen = KernelGenerator(inverse_distance_kernel(1e-1), points, points)
    hb = HMatrixTreeBuilder(1e-6, 10.0, "N", "N")
    hb.set_dtype(np.float64)

    approx = DefaultApproximationBuilder(gen, cluster, cluster, hb, None)
    mesh = make_global_mesh(P)
    sharded = ShardedDistributedOperator(approx.hmatrix, cluster, cluster,
                                         mesh)
    x = np.random.RandomState(1).rand(n)
    y = np.asarray(sharded * x)

    dense = 1.0 / (1e-1 + np.linalg.norm(
        points[:, :, None] - points[:, None, :], axis=0))
    err = np.linalg.norm(y - dense @ x) / np.linalg.norm(dense @ x)
    assert err < 1e-6, f"process {jax.process_index()}: err {err:.3e}"
    if is_primary():
        print(f"multihost dryrun ok: {N_PROCESSES} processes x "
              f"{DEVICES_PER_PROCESS} devices, product err {err:.3e}")


def launcher() -> int:
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    procs = []
    for pid in range(N_PROCESSES):
        env = dict(env_base)
        env.update({
            "MH_ROLE": "worker",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{PORT}",
            "JAX_NUM_PROCESSES": str(N_PROCESSES),
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen([sys.executable, __file__], env=env))
    rc = 0
    for p in procs:
        rc |= p.wait()
    return rc


if __name__ == "__main__":
    if os.environ.get("MH_ROLE") == "worker":
        worker()
    else:
        sys.exit(launcher())
