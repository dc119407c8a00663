"""Adversarial accuracy pin for the blockwise 0.5*epsilon safety policy.

The assembly compresses every block at half the requested tolerance
(hmatrix/assembly.py) to hold the OPERATOR-level contract rel-err < epsilon
(reference: /root/reference/tests/test_hmatrix.py:83) with margin.  That
margin is weakest exactly where partial ACA's running Frobenius estimate
is weakest: oscillatory complex kernels at tight tolerance (the
reference's non-sym golden regime is complex at eps = 1e-6,
/root/reference/tests/conftest.py:411).  This file pins the contract
there, through assembly AND recompression, so a policy regression fails
loudly instead of silently eroding accuracy.
"""

import numpy as np
import pytest

import htool_python_tpu as H
from htool_python_tpu.models.kernels import (
    helmholtz_kernel,
    hermitian_phase_kernel,
)


def _dense_from_kernel(kernel, pts):
    import jax.numpy as jnp
    x = jnp.asarray(pts.T)
    return np.asarray(kernel(x[:, None, :], x[None, :, :]))


@pytest.mark.parametrize("eps", [1e-6])
@pytest.mark.parametrize("wavenumber", [30.0])
def test_oscillatory_helmholtz_operator_contract(eps, wavenumber):
    """exp(ikr)/4pi r on the unit cube: k = 30 gives ~5 wavelengths across
    the domain — many sign changes inside admissible blocks, the regime
    where ACA stopping estimates under-report the true residual.  (The
    single tightest configuration is tested; looser eps/wavenumbers were
    verified interactively and are strictly easier.)"""
    n = 1200
    rng = np.random.RandomState(42)
    pts = rng.rand(3, n)
    cb = H.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(64)
    cluster = cb.create_cluster_tree(pts, 2)
    kern = helmholtz_kernel(wavenumber)
    gen = H.KernelGenerator(kern, pts, pts, is_complex=True)
    hm = H.HMatrixTreeBuilder(eps, 10.0, "N", "N").build(gen, cluster,
                                                         cluster)
    A = _dense_from_kernel(kern, pts)
    nrmA = np.linalg.norm(A)
    err = np.linalg.norm(hm.to_dense_in_user_numbering() - A) / nrmA
    assert err < eps, f"assembly operator error {err:.3e} >= eps {eps:g}"
    # recompression must not erode the contract
    H.recompression(hm)
    err_rc = np.linalg.norm(hm.to_dense_in_user_numbering() - A) / nrmA
    assert err_rc < eps, (
        f"post-recompression operator error {err_rc:.3e} >= eps {eps:g}")


def test_oscillatory_hermitian_contract_1e6():
    """Hermitian oscillatory kernel at eps = 1e-6 with one-triangle storage
    ('H'/'L'): the mirror path must hold the same operator contract."""
    n = 1200
    eps = 1e-6
    rng = np.random.RandomState(7)
    pts = rng.rand(3, n)
    cb = H.ClusterTreeBuilder()
    cb.set_maximal_leaf_size(64)
    cluster = cb.create_cluster_tree(pts, 2)
    kern = hermitian_phase_kernel(wavenumber=20.0)
    gen = H.KernelGenerator(kern, pts, pts, is_complex=True)
    hm = H.HMatrixTreeBuilder(eps, 10.0, "H", "L").build(gen, cluster,
                                                         cluster)
    A = _dense_from_kernel(kern, pts)
    err = np.linalg.norm(hm.to_dense_in_user_numbering() - A) / \
        np.linalg.norm(A)
    assert err < eps, f"hermitian operator error {err:.3e} >= eps {eps:g}"
