"""Pallas matvec kernels vs the XLA reference path (interpret mode on CPU).

The Pallas kernels (ops/pallas_matvec.py) are the TPU hot path; on the CPU
test mesh they run through the Pallas interpreter, pinned here against the
XLA gather/scatter formulation and the dense oracle
(reference contract: tests/test_hmatrix.py:83 rel error < epsilon).
"""

import numpy as np
import pytest

import htool_python_tpu as H
from htool_python_tpu.config import get_config


@pytest.fixture
def small_hmatrix():
    np.random.seed(3)
    n = 300
    points = np.random.random((3, n))
    cb = H.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(24)
    cluster = cb.create_cluster_tree(points, 2)
    from htool_python_tpu.models.kernels import inverse_distance_kernel
    gen = H.KernelGenerator(inverse_distance_kernel(0.1), points, points)
    return points, cluster, gen


@pytest.mark.parametrize("symmetry,UPLO", [("N", "N"), ("S", "L"),
                                           ("S", "U")])
@pytest.mark.parametrize("trans", ["N", "T"])
@pytest.mark.parametrize("mu", [1, 4])
def test_pallas_matches_xla(small_hmatrix, symmetry, UPLO, trans, mu):
    points, cluster, gen = small_hmatrix
    hb = H.HMatrixTreeBuilder(1e-4, 10.0, symmetry, UPLO)
    hb.set_dtype(np.float32)
    hm = hb.build(gen, cluster, cluster)
    n = hm.shape[0]
    x = np.random.rand(n, mu).astype(np.float32)
    cfg = get_config()
    try:
        cfg.matvec_backend = "xla"
        y_ref = hm.matvec(x, trans=trans)
        cfg.matvec_backend = "pallas"
        y_pal = hm.matvec(x, trans=trans)
    finally:
        cfg.matvec_backend = None
    err = np.linalg.norm(y_pal - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-6, err


def test_pallas_matches_dense_oracle(small_hmatrix):
    points, cluster, gen = small_hmatrix
    eps = 1e-3
    hb = H.HMatrixTreeBuilder(eps, 10.0, "N", "N")
    hb.set_dtype(np.float32)
    hm = hb.build(gen, cluster, cluster)
    n = hm.shape[0]
    x = np.random.rand(n).astype(np.float32)
    d = np.linalg.norm(points[:, :, None] - points[:, None, :], axis=0)
    y_exact = (1.0 / (0.1 + d)) @ x
    cfg = get_config()
    try:
        cfg.matvec_backend = "pallas"
        y = hm.matvec(x)
    finally:
        cfg.matvec_backend = None
    assert np.linalg.norm(y - y_exact) / np.linalg.norm(y_exact) < eps


@pytest.mark.parametrize("trans", ["N", "T", "C"])
@pytest.mark.parametrize("mu", [1, 3])
def test_complex64_planes_matches_xla(small_hmatrix, trans, mu):
    """complex64 two-plane fast path (ops/matvec.py split_planes): the
    real fused kernel applied to each of Re(A)/Im(A) with stacked
    [Re(x) | Im(x)] columns must match the XLA complex path for every
    trans variant."""
    points, cluster, gen = small_hmatrix
    from htool_python_tpu.models.kernels import hermitian_phase_kernel
    cgen = H.KernelGenerator(hermitian_phase_kernel(4.0), points, points,
                             is_complex=True)
    hb = H.HMatrixTreeBuilder(1e-4, 10.0, "N", "N")
    hb.set_dtype(np.complex64)
    hm = hb.build(cgen, cluster, cluster)
    n = hm.shape[0]
    rng = np.random.RandomState(9)
    x = (rng.rand(n, mu) + 1j * rng.rand(n, mu)).astype(np.complex64)
    cfg = get_config()
    try:
        cfg.matvec_backend = "xla"
        y_ref = hm.matvec(x, trans=trans)
        cfg.matvec_backend = "pallas"
        from htool_python_tpu.ops.matvec import is_planes, resolve_backend
        data = hm._product_data()
        assert is_planes(data), "plane split not selected for complex64"
        assert resolve_backend(data, hm._pad_len, mu, np.complex64,
                               "N") == "planes"
        y_pal = hm.matvec(x, trans=trans)
    finally:
        cfg.matvec_backend = None
    err = np.linalg.norm(y_pal - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-5, err


@pytest.mark.parametrize("symmetry,UPLO,kernel_kind",
                         [("H", "L", "hermitian"), ("H", "U", "hermitian"),
                          ("S", "L", "symmetric")])
@pytest.mark.parametrize("trans", ["N", "T", "C"])
def test_complex64_symmetric_planes_matches_xla(small_hmatrix, symmetry,
                                                UPLO, kernel_kind, trans):
    """complex64 'H'/'S' storage through the plane kernel (r04 gap: these
    fell back to the ~20x XLA path): the mirror term applies the
    (conjugate-)transpose plane pair with csign_mirror, pinned against
    the XLA path for every trans variant."""
    points, cluster, gen = small_hmatrix
    n = points.shape[1]
    from htool_python_tpu.models.kernels import hermitian_phase_kernel
    if kernel_kind == "hermitian":
        kern = hermitian_phase_kernel(4.0)  # K(x,y) = conj(K(y,x))
        cgen = H.KernelGenerator(kern, points, points, is_complex=True)
    else:
        # complex-SYMMETRIC kernel: K(x,y) = K(y,x) (distance phase)
        d = np.linalg.norm(points[:, :, None] - points[:, None, :], axis=0)
        A = (np.exp(1j * 2.0 * d) / (0.1 + d + np.eye(n))).astype(
            np.complex64)
        np.fill_diagonal(A, n)
        cgen = H.MatrixGenerator(A)
    hb = H.HMatrixTreeBuilder(1e-4, 10.0, symmetry, UPLO)
    hb.set_dtype(np.complex64)
    hm = hb.build(cgen, cluster, cluster)
    rng = np.random.RandomState(9)
    x = (rng.rand(n) + 1j * rng.rand(n)).astype(np.complex64)
    cfg = get_config()
    try:
        cfg.matvec_backend = "xla"
        y_ref = hm.matvec(x, trans=trans)
        cfg.matvec_backend = "pallas"
        from htool_python_tpu.ops.matvec import is_planes, resolve_backend
        data = hm._product_data()
        assert is_planes(data), "plane split not selected for c64 " \
            + symmetry
        assert resolve_backend(data, hm._pad_len, 1, np.complex64,
                               symmetry) == "planes"
        y_pal = hm.matvec(x, trans=trans)
    finally:
        cfg.matvec_backend = None
    err = np.linalg.norm(y_pal - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-5, err


def test_aligned_layout_selected_for_f32(small_hmatrix):
    """f32 on the pallas backend uses the lane-aligned low-rank layout
    (ops/matvec.py align_lowrank): factors pre-shifted so the kernel's
    per-block loads/stores are aligned slices, offsets multiples of 128."""
    import numpy as _np

    from htool_python_tpu.ops.matvec import is_aligned

    points, cluster, gen = small_hmatrix
    hb = H.HMatrixTreeBuilder(1e-4, 10.0, "N", "N")
    hb.set_dtype(np.float32)
    hm = hb.build(gen, cluster, cluster)
    n = hm.shape[0]
    x = np.random.rand(n, 2).astype(np.float32)
    cfg = get_config()
    try:
        cfg.matvec_backend = "xla"
        y_ref = hm.matvec(x)
        cfg.matvec_backend = "pallas"
        cfg.matvec_aligned_layout = True
        data = hm._product_data()
        assert is_aligned(data)
        for entry in data["aligned"]["lr"]:
            t_off, s_off = _np.asarray(entry[2]), _np.asarray(entry[3])
            assert (t_off % 128 == 0).all() and (s_off % 128 == 0).all()
        y_al = hm.matvec(x)
    finally:
        cfg.matvec_backend = None
        cfg.matvec_aligned_layout = False
    err = np.linalg.norm(y_al - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-6, err


def test_wide_k_column_chunk_fallback(small_hmatrix):
    """Wide-RHS requests re-check kernel VMEM fit at the ACTUAL k and fall
    back to column chunks (ops/matvec.py _max_fit_k/_apply_col_chunks) —
    the r04 advisor finding: cached product layouts were validated at k=1
    only, and a later wide apply (HODLR peeling pushes 128-column chunks)
    must not die at kernel compile time."""
    import jax.numpy as jnp

    from htool_python_tpu.ops.matvec import (_apply_col_chunks, _max_fit_k,
                                             apply_hmatrix, resolve_backend)

    points, cluster, gen = small_hmatrix
    hb = H.HMatrixTreeBuilder(1e-4, 10.0, "N", "N")
    hb.set_dtype(np.float32)
    hm = hb.build(gen, cluster, cluster)
    n = hm.shape[0]
    L = hm._pad_len
    cfg = get_config()
    try:
        cfg.matvec_backend = "pallas"
        data = hm._product_data()
        backend = resolve_backend(data, L, 1, np.float32)
        k = 8
        x_pad = jnp.zeros((L, k), jnp.float32).at[:n].set(
            jnp.asarray(np.random.rand(n, k).astype(np.float32)))
        y_full = apply_hmatrix(data, x_pad, L, "N", "N", backend)
        # the chunked fallback path must agree with the one-shot kernel
        y_chunked = _apply_col_chunks(
            lambda xc: apply_hmatrix(data, xc, L, "N", "N", backend),
            x_pad, 2)
        assert y_chunked.shape == y_full.shape
        err = (np.linalg.norm(np.asarray(y_chunked - y_full))
               / np.linalg.norm(np.asarray(y_full)))
        assert err < 1e-6, err
    finally:
        cfg.matvec_backend = None

    # _max_fit_k walks down to the largest fitting power of two (floor 1)
    assert _max_fit_k(lambda kk: kk <= 3, 16) == 2
    assert _max_fit_k(lambda kk: True, 16) == 16
    assert _max_fit_k(lambda kk: False, 16) == 1
