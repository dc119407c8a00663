"""Complex host<->device transfer shims.

The remote TPU backend in this environment ("axon", registered as platform
'tpu') does not implement complex-typed host<->device TRANSFERS: any
`jnp.asarray(complex ndarray)` or `np.asarray(complex jax array)` raises a
deferred `UNIMPLEMENTED` at the next synchronization — while on-device
complex computation (jitted or eagerly dispatched primitives) works fine.
Even an eager `jnp.zeros((..), complex64)` trips it, because the complex
scalar fill value is itself transferred.

These helpers probe the capability once and, when transfers are broken,
route complex arrays through their real/imaginary planes: two real
transfers plus a tiny jitted combine/split on either side.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_COMPLEX_TRANSFER_OK: bool | None = None


def _complex_transfer_ok() -> bool:
    """Probing by attempting a transfer is NOT an option: one failed
    complex transfer latches the remote runtime into an error state that
    poisons subsequent unrelated device_puts.  The real-pair route is
    near-free (two real transfers + a tiny fused combine/split), so it is
    simply always used on TPU backends."""
    global _COMPLEX_TRANSFER_OK
    if _COMPLEX_TRANSFER_OK is None:
        _COMPLEX_TRANSFER_OK = jax.default_backend() != "tpu"
    return _COMPLEX_TRANSFER_OK


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


@jax.jit
def _split(z):
    return jnp.real(z), jnp.imag(z)


def to_device(x, dtype=None):
    """jnp.asarray with a complex-safe host->device path."""
    if (isinstance(x, np.ndarray) and np.iscomplexobj(x)
            and not _complex_transfer_ok()):
        re = jnp.asarray(np.ascontiguousarray(x.real))
        im = jnp.asarray(np.ascontiguousarray(x.imag))
        z = _combine(re, im)
    else:
        z = jnp.asarray(x)
    return z if dtype is None else z.astype(dtype)


def to_host(y) -> np.ndarray:
    """np.asarray with a complex-safe device->host path."""
    if isinstance(y, jnp.ndarray) and jnp.issubdtype(y.dtype,
                                                    jnp.complexfloating) \
            and not _complex_transfer_ok():
        re, im = _split(y)
        out = np.asarray(re).astype(
            np.complex64 if y.dtype == jnp.complex64 else np.complex128)
        out += 1j * np.asarray(im)
        return out
    return np.asarray(y)
