"""Row-partitioned distributed operator: the SPMD replacement for MPI.

The reference runs P MPI processes, each assembling the H-matrix block row
of its target partition and allgather-ing products.  Here the P block rows
live in ONE process as batched device arrays; on a multi-device
`jax.sharding.Mesh` the same block rows shard over devices and the
global-to-global product compiles to a single `shard_map` program whose
collectives ride the interconnect.

Porting from Htool: `DefaultApproximationBuilder(generator, target, source,
hmatrix_builder, comm)` (comm accepted for signature parity, unused),
`distributed_operator * x` / `@ X` global-to-global semantics, and
`get_distributed_information` match the reference
(example/use_distributed_operator.py); `ShardedDistributedOperator` is the
mesh-parallel execution of the same operator.
"""

import matplotlib.pyplot as plt
import numpy as np

from _example_env import finish_plot, n_partitions  # noqa: I001

import htool_python_tpu as Htool
from htool_python_tpu.models.geometry import create_partitioned_geometries
from htool_python_tpu.models.kernels import inverse_distance_kernel

EPSILON = 1e-3


def build_operator(P):
    # pre-partitioned geometry: P shifted clusters + the (2, P) offset/size
    # table describing the contiguous user-numbering partition
    target_pts, source_pts, partition = create_partitioned_geometries(
        3, 1200, 1200, P)
    cb = Htool.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(32)
    target = cb.create_cluster_tree_from_local_partition(
        target_pts, 2, P, partition)
    source = cb.create_cluster_tree(source_pts, 2)
    gen = Htool.KernelGenerator(inverse_distance_kernel(0.1),
                                target_pts, source_pts)
    hb = Htool.HMatrixTreeBuilder(EPSILON, 10.0, "N", "N")
    approx = Htool.DefaultApproximationBuilder(gen, target, source, hb, None)
    return target_pts, source_pts, target, source, approx


def main():
    P = n_partitions(2)
    np.random.seed(0)
    tp, sp, target, source, approx = build_operator(P)
    op = approx.distributed_operator
    n = op.shape[1]

    # post-assembly rank re-truncation, one batched pass per partition
    Htool.openmp_recompression(approx.hmatrix)

    # dense oracle for the accuracy check
    d = np.linalg.norm(tp[:, :, None] - sp[:, None, :], axis=0)
    A = 1.0 / (0.1 + d)

    x = np.random.rand(n)
    y = op * x
    rel = np.linalg.norm(y - A @ x) / np.linalg.norm(A @ x)
    print(f"global matvec rel err {rel:.2e}")
    assert rel < EPSILON

    X = np.asfortranarray(np.random.rand(n, 3))
    rel_m = np.linalg.norm(op @ X - A @ X) / np.linalg.norm(A @ X)
    print(f"global matmat rel err {rel_m:.2e}")
    assert rel_m < EPSILON

    # the solver hot loop never leaves the device: build_device_apply
    # exposes the product as a traceable function whose H-matrix data rides
    # the `operands` protocol (jit arguments, not HLO constants)
    import jax.numpy as jnp
    fn = op.build_device_apply()
    y_dev = np.asarray(fn(fn.operands, jnp.asarray(x[:, None])))[:, 0]
    assert np.linalg.norm(y_dev - y) < 1e-10 * np.linalg.norm(y)

    # mesh execution: shard the P block rows over P devices
    import jax
    if len(jax.devices()) >= P:
        from htool_python_tpu.parallel.sharded import (
            ShardedDistributedOperator, make_mesh)
        sharded = ShardedDistributedOperator(approx.hmatrix, target, source,
                                             make_mesh(P))
        y_mesh = sharded * x
        print("mesh product matches:",
              float(np.linalg.norm(y_mesh - y) / np.linalg.norm(y)))

    print("shape:", op.shape)
    print(op.get_distributed_information())

    fig = plt.figure(figsize=(9, 4.5))
    ax1 = fig.add_subplot(1, 2, 1, projection="3d")
    ax2 = fig.add_subplot(1, 2, 2)
    ax1.set_title(f"target partitions (P={P})")
    ax2.set_title("block row of partition 0")
    Htool.plot(ax1, target, tp, 1)
    Htool.plot(ax2, approx.hmatrix[0])
    finish_plot(fig, "use_distributed_operator")


if __name__ == "__main__":
    main()
