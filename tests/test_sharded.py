"""Sharded (device-mesh) execution tests: the SPMD distributed product and
batched subdomain preconditioner over a virtual 8-device CPU mesh must
match the single-device path."""

import numpy as np
import pytest

import htool_python_tpu as H
from htool_python_tpu.parallel.sharded import (
    ShardedDistributedOperator,
    make_mesh,
    sharded_block_solve,
)
from conftest import CustomGenerator


@pytest.mark.parametrize("n_partitions", [2, 4, 8])
def test_sharded_matvec(n_partitions):
    np.random.seed(0)
    n = 400
    pts = np.random.random((3, n))
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(10)
    cluster = builder.create_cluster_tree(pts, 2,
                                          size_of_partition=n_partitions)
    generator = CustomGenerator(pts, pts)
    epsilon = 1e-4
    approx = H.DefaultApproximationBuilder(
        generator, cluster, cluster,
        H.HMatrixTreeBuilder(epsilon, 10.0, "N", "N"), None)

    mesh = make_mesh(n_partitions)
    sharded = ShardedDistributedOperator(approx.hmatrix, cluster, cluster,
                                         mesh)
    x = np.random.rand(n)
    y_sharded = sharded * x
    y_ref = approx.distributed_operator * x
    y_exact = generator.mat_vec(x)
    assert np.linalg.norm(y_sharded - y_ref) / np.linalg.norm(y_ref) < 1e-12
    assert (np.linalg.norm(y_sharded - y_exact) / np.linalg.norm(y_exact)
            < epsilon)

    X = np.random.rand(n, 3)
    Y = sharded @ X
    assert (np.linalg.norm(Y - approx.distributed_operator @ X)
            / np.linalg.norm(Y) < 1e-12)


def test_sharded_block_solve():
    np.random.seed(1)
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    n, P, m = 64, 4, 24
    mesh = make_mesh(P)
    # random overlapping index sets
    idx = np.zeros((P, m), dtype=np.int64)
    own = np.array_split(np.arange(n), P)
    weights = np.zeros((P, m))
    A = np.random.rand(n, n) + n * np.eye(n)
    mats = np.zeros((P, m, m))
    for p in range(P):
        extra = np.random.choice(np.setdiff1d(np.arange(n), own[p]),
                                 m - len(own[p]), replace=False)
        ids = np.concatenate([own[p], extra])
        idx[p] = ids
        weights[p, :len(own[p])] = 1.0  # boolean POU on owned dofs
        mats[p] = A[np.ix_(ids, ids)]
    lu, piv = jsl.lu_factor(jnp.asarray(mats))
    precond = sharded_block_solve(mesh, lu, piv, idx, weights, n)

    r = np.random.rand(n)
    z = precond(r)
    # reference: sequential RAS
    z_ref = np.zeros(n)
    for p in range(P):
        loc = np.linalg.solve(mats[p], r[idx[p]])
        z_ref[idx[p]] += weights[p] * loc
    assert np.linalg.norm(z - z_ref) / np.linalg.norm(z_ref) < 1e-12
