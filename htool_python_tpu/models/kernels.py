"""Model kernels (jax-traceable), for KernelGenerator and benchmarks.

These are the TPU-native analogs of the reference's example generators
(example/define_generators.py:14-17 uses 1/(0.1 + |x - y|)); Laplace and
Helmholtz Green kernels cover the BEM-style workloads H-matrices target.
All kernels map broadcastable coordinate arrays (..., dim) -> (...,).
"""

from __future__ import annotations

import jax.numpy as jnp


def _dist(x, y):
    return jnp.sqrt(jnp.sum((x - y) ** 2, axis=-1))


def inverse_distance_kernel(shift: float = 1e-1):
    """1 / (shift + |x - y|): the reference example/test kernel."""

    def k(x, y):
        return 1.0 / (shift + _dist(x, y))

    return k


def laplace_kernel(regularization: float = 1e-8):
    """3-D Laplace single layer 1 / (4 pi |x - y|), regularized diagonal."""

    def k(x, y):
        r = _dist(x, y)
        return 1.0 / (4.0 * jnp.pi * jnp.maximum(r, regularization))

    return k


def hermitian_phase_kernel(wavenumber: float = 2.0, shift: float = 1e-1):
    """exp(i w (x_0 - y_0)) / (shift + |x - y|): smooth, complex, and
    HERMITIAN (k(y, x) = conj(k(x, y))) — the 'H'-symmetry test kernel."""

    def k(x, y):
        return jnp.exp(1j * wavenumber * (x[..., 0] - y[..., 0])) / (
            shift + _dist(x, y))

    return k


def helmholtz_kernel(wavenumber: float, regularization: float = 1e-8):
    """3-D Helmholtz single layer exp(i k r) / (4 pi r) (complex)."""

    def k(x, y):
        r = jnp.maximum(_dist(x, y), regularization)
        return jnp.exp(1j * wavenumber * r) / (4.0 * jnp.pi * r)

    return k


def second_kind_kernel(shift: float = 1e-1, diagonal: float = 10.0):
    """diagonal * I + 1 / (shift + |x - y|): a second-kind-integral-equation
    style operator (identity plus smooth kernel) — well-conditioned at any
    N, unlike the bare smooth kernel whose condition number grows without
    bound.  The realistic regime for solver / factorization tests: an
    f32 epsilon-accurate factorization of a cond ~1e5 operator cannot
    solve below cond * eps regardless of algorithm."""

    def k(x, y):
        d = _dist(x, y)
        return jnp.where(d <= 1e-12, diagonal, 0.0) + 1.0 / (shift + d)

    return k
