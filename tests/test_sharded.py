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


def test_sharded_plan_has_rank_smaller_than_block():
    """Coverage pin for the low-rank layout: the sharded plan MUST contain
    low-rank buckets whose rank-class differs from the padded block size,
    so any layout mismatch between ops/matvec.py (rank-major Ut (nb,r,pt))
    and the sharded block-row apply crashes or mismatches HERE rather than
    only for certain accidental plan geometries (the round-2 regression
    shipped because every tested bucket happened to have r == pt)."""
    np.random.seed(3)
    n = 1200
    pts = np.random.random((3, n))
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(64)
    cluster = builder.create_cluster_tree(pts, 2, size_of_partition=4)
    generator = CustomGenerator(pts, pts)
    epsilon = 1e-2
    approx = H.DefaultApproximationBuilder(
        generator, cluster, cluster,
        H.HMatrixTreeBuilder(epsilon, 100.0, "N", "N"), None)
    mesh = make_mesh(4)
    sharded = ShardedDistributedOperator(approx.hmatrix, cluster, cluster,
                                         mesh)
    # stacked low-rank buckets are (P, nb, r, pt): require one with r != pt
    shapes = [(U.shape[2], U.shape[3]) for U, *_ in sharded._data["lr"]]
    assert shapes, "plan produced no low-rank buckets at all"
    assert any(r != pt for r, pt in shapes), (
        f"every low-rank bucket has rank-class == padded size ({shapes}); "
        "the layout-sensitive path is not exercised")
    x = np.random.rand(n)
    y = sharded * x
    y_exact = generator.mat_vec(x)
    assert np.linalg.norm(y - y_exact) / np.linalg.norm(y_exact) < epsilon
    yt = sharded.matvec_global(x, trans="T")
    dense = np.zeros((n, n), order="F")
    generator.build_submatrix(np.arange(n), np.arange(n), dense)
    yt_exact = dense.T @ x
    assert np.linalg.norm(yt - yt_exact) / np.linalg.norm(yt_exact) < epsilon


def test_sharded_hybrid_mesh_matvec():
    """The sharded operator over a 2-D (hosts x per-host) hybrid mesh —
    the multi-host layout (parallel/multihost.make_hybrid_mesh) — must
    match the dense oracle exactly like the 1-D mesh."""
    import jax
    from jax.sharding import Mesh

    np.random.seed(5)
    n = 600
    pts = np.random.random((3, n))
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(16)
    cluster = builder.create_cluster_tree(pts, 2, size_of_partition=8)
    generator = CustomGenerator(pts, pts)
    epsilon = 1e-4
    approx = H.DefaultApproximationBuilder(
        generator, cluster, cluster,
        H.HMatrixTreeBuilder(epsilon, 10.0, "N", "N"), None)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("host", "p"))
    sharded = ShardedDistributedOperator(approx.hmatrix, cluster, cluster,
                                         mesh)
    x = np.random.rand(n)
    y = sharded * x
    y_exact = generator.mat_vec(x)
    assert np.linalg.norm(y - y_exact) / np.linalg.norm(y_exact) < epsilon
    yt = sharded.matvec_global(x, trans="T")
    dense = generator.dense()
    assert (np.linalg.norm(yt - dense.T @ x)
            / np.linalg.norm(dense.T @ x) < epsilon)


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
