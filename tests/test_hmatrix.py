"""H-matrix tests (parity with reference tests/test_hmatrix.py):
oracle #1 (brute-force kernel, rel error < epsilon) and oracle #2
(densified self-consistency < 1e-10), LU/Cholesky solves < epsilon."""

import copy
import logging
import math

import numpy as np
import pytest

import htool_python_tpu as H
from conftest import CustomGenerator


class CustomSVD(H.VirtualLowRankGenerator):
    """User compression hook (parity with the reference's CustomSVD example
    semantics: truncated SVD, False when not worthwhile)."""

    def __init__(self, generator, allow_copy=True):
        super().__init__(allow_copy)
        self.generator = generator

    def build_low_rank_approximation(self, rows, cols, epsilon):
        submat = np.zeros((len(rows), len(cols)), order="F")
        self.generator.build_submatrix(rows, cols, submat)
        u, s, vh = np.linalg.svd(submat, full_matrices=False)
        norm = np.linalg.norm(submat)
        svd_norm = 0.0
        truncated_rank = len(s) - 1
        while truncated_rank > 0 and math.sqrt(svd_norm) / norm < epsilon:
            svd_norm += s[truncated_rank] ** 2
            truncated_rank -= 1
        truncated_rank += 1
        if truncated_rank * (len(rows) + len(cols)) > len(rows) * len(cols):
            return False
        self.set_U(u[:, :truncated_rank] * s[:truncated_rank])
        self.set_V(vh[:truncated_rank, :])
        return True


def _make_geometry(symmetry, nb_rows, nb_cols, dimension=3):
    np.random.seed(0)
    target = np.random.random((dimension, nb_rows))
    if symmetry == "N":
        source = np.random.random((dimension, nb_cols))
        source[0, :] += 0.0
    else:
        source = target
    return target, source


@pytest.mark.parametrize(
    "loglevel,symmetry",
    [
        (logging.INFO, "N"),
        (logging.DEBUG, "N"),
        (logging.WARNING, "N"),
        (logging.INFO, "S"),
    ],
)
@pytest.mark.parametrize("use_custom_lrg", [False, True])
def test_hmatrix(loglevel, symmetry, use_custom_lrg):
    logging.basicConfig(level=loglevel)
    nb_rows = nb_cols = 500
    eta, epsilon = 100.0, 1e-3
    target, source = _make_geometry(symmetry, nb_rows, nb_cols)

    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(10)
    target_cluster = builder.create_cluster_tree(target, 2)
    source_cluster = (target_cluster if symmetry != "N"
                      else builder.create_cluster_tree(source, 2))
    generator = CustomGenerator(target, source if symmetry == "N" else target)

    hbuilder = H.HMatrixTreeBuilder(epsilon, eta, "N", "N")
    if use_custom_lrg:
        lrg = CustomSVD(generator, False)
        hbuilder.set_low_rank_generator(lrg)
    hmatrix = hbuilder.build(generator, target_cluster, source_cluster)
    assert hmatrix.shape == (nb_rows, nb_cols)

    copy_hmatrix = copy.deepcopy(hmatrix)
    dense_user = hmatrix.to_dense_in_user_numbering()

    np.random.seed(0)
    x = np.random.rand(nb_cols)
    y = hmatrix * x
    y_exact = generator.mat_vec(x)
    y_dense = dense_user.dot(x)
    y_copy = copy_hmatrix * x
    assert np.linalg.norm(y - y_exact) / np.linalg.norm(y_exact) < epsilon
    assert np.linalg.norm(y - y_dense) / np.linalg.norm(y_dense) < 1e-10
    assert np.linalg.norm(y - y_copy) < 1e-10

    X = np.random.rand(nb_cols, 2)
    Y = hmatrix @ X
    Y_exact = generator.mat_mat(X)
    Y_dense = dense_user @ X
    Y_copy = copy_hmatrix @ X
    assert np.linalg.norm(Y - Y_exact) / np.linalg.norm(Y_exact) < epsilon
    assert np.linalg.norm(Y - Y_dense) / np.linalg.norm(Y_dense) < 1e-10
    assert np.linalg.norm(Y - Y_copy) < 1e-10

    if use_custom_lrg:
        lrg.clear_data()

    print(hmatrix.get_tree_parameters())
    print(hmatrix.get_local_information())


@pytest.mark.parametrize("sym_mode", ["S", "N"])
def test_hmatrix_symmetric_storage(sym_mode):
    """Symmetric one-triangle storage must match the full build."""
    nb = 400
    target, _ = _make_geometry("S", nb, nb)
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(10)
    cluster = builder.create_cluster_tree(target, 2)
    generator = CustomGenerator(target, target)
    epsilon, eta = 1e-3, 10.0
    hb = (H.HMatrixTreeBuilder(epsilon, eta, "S", "L") if sym_mode == "S"
          else H.HMatrixTreeBuilder(epsilon, eta, "N", "N"))
    hmatrix = hb.build(generator, cluster, cluster)
    np.random.seed(0)
    x = np.random.rand(nb)
    y = hmatrix * x
    y_exact = generator.mat_vec(x)
    assert np.linalg.norm(y - y_exact) / np.linalg.norm(y_exact) < epsilon
    # densified consistency
    d = hmatrix.to_dense_in_user_numbering()
    assert np.linalg.norm(d @ x - y) / np.linalg.norm(y) < 1e-10
    if sym_mode == "S":
        assert np.linalg.norm(d - d.T) / np.linalg.norm(d) < 1e-14


def test_hmatrix_factorizations():
    nb = 500
    target, _ = _make_geometry("S", nb, nb)
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(10)
    cluster = builder.create_cluster_tree(target, 2)
    generator = CustomGenerator(target, target)
    epsilon = 1e-3
    hb = H.HMatrixTreeBuilder(epsilon, 100.0, "S", "L")
    hmatrix = hb.build(generator, cluster, cluster)

    # HLU
    copy_h = copy.deepcopy(hmatrix)
    copy_h.lu_factorization()
    x_ref = np.ones(nb)
    y = hmatrix * x_ref
    x = copy_h.lu_solve("N", y)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < epsilon
    x_ref2 = np.ones((nb, 2))
    y2 = hmatrix @ x_ref2
    x2 = copy_h.lu_solve("N", y2)
    assert np.linalg.norm(x2 - x_ref2) / np.linalg.norm(x_ref2) < epsilon

    # Cholesky (kernel matrix is SPD)
    copy_h = copy.deepcopy(hmatrix)
    copy_h.cholesky_factorization("L")
    x = copy_h.cholesky_solve("L", y)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < epsilon
    x2 = copy_h.cholesky_solve("L", y2)
    assert np.linalg.norm(x2 - x_ref2) / np.linalg.norm(x_ref2) < epsilon


def test_transpose_products():
    nb_rows, nb_cols = 300, 200
    target, source = _make_geometry("N", nb_rows, nb_cols)
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(10)
    tc = builder.create_cluster_tree(target, 2)
    sc = builder.create_cluster_tree(source, 2)
    generator = CustomGenerator(target, source)
    epsilon = 1e-4
    hmatrix = H.HMatrixTreeBuilder(epsilon, 10.0, "N", "N").build(
        generator, tc, sc)
    A = generator.dense()
    np.random.seed(1)
    x = np.random.rand(nb_rows)
    yt = hmatrix.matvec(x, trans="T")
    assert (np.linalg.norm(yt - A.T @ x) / np.linalg.norm(A.T @ x)
            < epsilon * 5)


def test_recompression():
    nb = 400
    target, source = _make_geometry("N", nb, nb)
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(10)
    tc = builder.create_cluster_tree(target, 2)
    sc = builder.create_cluster_tree(source, 2)
    generator = CustomGenerator(target, source)
    hmatrix = H.HMatrixTreeBuilder(1e-6, 10.0, "N", "N").build(
        generator, tc, sc)
    info_before = hmatrix.get_local_information()
    H.recompression(hmatrix, 1e-3)
    info_after = hmatrix.get_local_information()
    assert (float(info_after["Compression_ratio"])
            >= float(info_before["Compression_ratio"]))
    np.random.seed(0)
    x = np.random.rand(nb)
    y = hmatrix * x
    y_exact = generator.mat_vec(x)
    assert np.linalg.norm(y - y_exact) / np.linalg.norm(y_exact) < 1e-3
    H.openmp_recompression(hmatrix)


def _ring_geometry(n):
    """Unit circle: strongly compressible for the 1/(0.1+r) kernel with
    MANY admissible leaves (a random volume cloud at this scale has
    nearly none, which would make recompression tests vacuous)."""
    th = 2 * np.pi * np.arange(n) / n
    return np.vstack([np.cos(th), np.sin(th), 0 * th])


def test_recompression_custom_callback():
    """`recompression(h, callback)` overload (reference
    hmatrix.hpp:96-99): the per-leaf hook replaces factors (here an SVD
    re-truncation at a looser eps) or returns None to keep the leaf."""
    import scipy.linalg as sla

    nb = 1200
    target = _ring_geometry(nb)
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(30)
    tc = builder.create_cluster_tree(target, 2)
    generator = CustomGenerator(target, target)
    hmatrix = H.HMatrixTreeBuilder(1e-6, 10.0, "N", "N").build(
        generator, tc, tc)
    calls = {"n": 0, "replaced": 0}

    def callback(U, V, eps):
        calls["n"] += 1
        if U.shape[1] <= 2:
            return None  # keep tiny leaves untouched
        Q, R = np.linalg.qr(U)
        W, s, Zh = sla.svd(R @ V, full_matrices=False)
        keep = max(int(np.sum(s > 1e-3 * s[0])), 1)
        calls["replaced"] += 1
        return Q @ W[:, :keep] * s[:keep], Zh[:keep]

    info_before = hmatrix.get_local_information()
    H.recompression(hmatrix, 1e-3, callback)
    info_after = hmatrix.get_local_information()
    assert calls["n"] > 0 and calls["replaced"] > 0
    assert (float(info_after["Compression_ratio"])
            >= float(info_before["Compression_ratio"]))
    np.random.seed(0)
    x = np.random.rand(nb)
    y = hmatrix * x
    y_exact = generator.mat_vec(x)
    assert np.linalg.norm(y - y_exact) / np.linalg.norm(y_exact) < 5e-3


def test_recompression_svd_form_fast_path():
    """Default-assembly factors are SVD triples (every compression path
    ends in an SVD-based truncation), so recompression takes the
    O(stored bytes) trim (`_recompress_svd_form`) instead of the QR+SVD
    pass.  Pin: (a) the fast path is selected, (b) it matches the general
    streaming path rank-for-rank, (c) deepcopies recompress independently
    (the shared-_data aliasing regression)."""
    import copy

    nb = 1200
    target = _ring_geometry(nb)
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(30)
    tc = builder.create_cluster_tree(target, 2)
    generator = CustomGenerator(target, target)
    hmatrix = H.HMatrixTreeBuilder(1e-8, 10.0, "N", "N").build(
        generator, tc, tc)
    assert hmatrix._lr_svd_form  # default path => fast recompression

    h_fast = copy.deepcopy(hmatrix)
    h_slow = copy.deepcopy(hmatrix)
    h_slow._lr_svd_form = False  # force the general streaming path
    H.recompression(h_fast, 1e-3)
    H.recompression(h_slow, 1e-3)
    assert h_fast._lr_svd_form  # trimmed SVD triples stay SVD triples

    rank_sum = lambda h: sum(int(np.sum(r)) for r in h._lr_ranks)
    s_fast, s_slow, s_orig = rank_sum(h_fast), rank_sum(h_slow), \
        rank_sum(hmatrix)
    assert s_fast < s_orig  # it actually recompressed
    # both paths apply the same tail-energy criterion to the same
    # singular values — ranks agree (tiny fp slack on boundary values)
    assert abs(s_fast - s_slow) <= max(1, s_slow // 200)

    np.random.seed(0)
    x = np.random.rand(nb)
    y_exact = generator.mat_vec(x)
    for h in (h_fast, h_slow):
        y = h * x
        assert np.linalg.norm(y - y_exact) / np.linalg.norm(y_exact) < 5e-3
    # the original operator is untouched by recompressing its deepcopies
    y0 = hmatrix * x
    assert np.linalg.norm(y0 - y_exact) / np.linalg.norm(y_exact) < 1e-6

    # a custom low-rank hook yields factors of unknown form: no fast path
    class _Lrg(H.VirtualLowRankGenerator):
        def build_low_rank_approximation(self, rows, cols, epsilon):
            return False  # densify everything

    h_custom = H.HMatrixTreeBuilder(
        1e-3, 10.0, "N", "N",
        low_rank_strategy=_Lrg()).build(generator, tc, tc)
    assert not h_custom._lr_svd_form


def test_recompression_reclasses_ranks():
    """Streaming recompression re-buckets by the NEW rank classes: after
    a 1e-6 -> 1e-2 recompression the stored (padded) factor bytes must
    shrink, not just the logical ranks."""
    nb = 1200
    target = _ring_geometry(nb)
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(30)
    tc = builder.create_cluster_tree(target, 2)
    generator = CustomGenerator(target, target)
    hmatrix = H.HMatrixTreeBuilder(1e-8, 10.0, "N", "N").build(
        generator, tc, tc)

    def padded_lr_bytes(h):
        return sum(
            (int(np.prod(u.shape)) + int(np.prod(v.shape)))
            * u.dtype.itemsize for u, v, *_ in h._data["lr"])

    before = padded_lr_bytes(hmatrix)
    H.recompression(hmatrix, 1e-2)
    after = padded_lr_bytes(hmatrix)
    assert after < before
    np.random.seed(0)
    x = np.random.rand(nb)
    y = hmatrix * x
    y_exact = generator.mat_vec(x)
    assert np.linalg.norm(y - y_exact) / np.linalg.norm(y_exact) < 1e-1


def test_hmatrix_plot():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    nb = 200
    target, _ = _make_geometry("S", nb, nb)
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(10)
    cluster = builder.create_cluster_tree(target, 2)
    generator = CustomGenerator(target, target)
    hmatrix = H.HMatrixTreeBuilder(1e-3, 10.0, "N", "N").build(
        generator, cluster, cluster)
    fig, ax = plt.subplots()
    H.plot(ax, hmatrix)
    plt.close(fig)


def test_reqrank():
    nb = 300
    target, source = _make_geometry("N", nb, nb)
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(10)
    tc = builder.create_cluster_tree(target, 2)
    sc = builder.create_cluster_tree(source, 2)
    generator = CustomGenerator(target, source)
    hmatrix = H.HMatrixTreeBuilder(1e-8, 10.0, "N", "N", reqrank=3).build(
        generator, tc, sc)
    for _, b, r in [(None, b, r) for b, r in
                    zip(hmatrix.plan.lowrank_buckets, hmatrix._lr_ranks)]:
        assert (r <= 3).all()


def test_low_rank_strategy_ctor_arg():
    """`low_rank_strategy` is the ctor spelling of set_low_rank_generator
    (reference: hmatrix_tree_builder.hpp:23-32, default nullptr); anything
    that is not a VirtualLowRankGenerator raises instead of being silently
    ignored."""
    nb = 300
    target, _ = _make_geometry("S", nb, nb)
    builder = H.ClusterTreeBuilder()
    builder.set_maximal_leaf_size(10)
    cluster = builder.create_cluster_tree(target, 2)
    generator = CustomGenerator(target, target)
    lrg = CustomSVD(generator)
    hb = H.HMatrixTreeBuilder(1e-3, 100.0, "N", "N", -1, lrg)
    assert hb._low_rank_generator is lrg
    hm = hb.build(generator, cluster, cluster)
    np.random.seed(3)
    x = np.random.rand(nb)
    y_exact = generator.mat_vec(x)
    assert (np.linalg.norm(hm * x - y_exact) / np.linalg.norm(y_exact)
            < 1e-3)
    with pytest.raises(TypeError):
        H.HMatrixTreeBuilder(1e-3, 100.0, "N", "N", -1, "partialACA")
