"""Bucketed H-matrix product kernels (the hot path).

TPU-native replacement for the reference core's
`add_hmatrix_vector_product` / `add_hmatrix_matrix_product`
(reference binding: src/htool/hmatrix/hmatrix.hpp:96-139).  The H-matrix is
stored as buckets of equally-padded blocks; a product is, per bucket:

  gather source segments -> one batched GEMM (MXU) -> scatter-add to target

Low-rank buckets do the two-stage batched GEMM  w = V x_s ; y_t += U w.
Symmetric ('S') / hermitian ('H') storage keeps one triangle only; blocks
flagged `mirror` additionally contribute their (conj-)transpose.

All functions are module-level jitted with pytree inputs so XLA's
compilation cache is keyed by bucket shapes (one compile per plan shape,
reused across calls — e.g. every Krylov iteration).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# full-f32 MXU passes: the product IS the accuracy contract (<= epsilon);
# these ops are HBM-bandwidth-bound so the higher precision is ~free
_HI = jax.lax.Precision.HIGHEST


def _iota(n):
    return jnp.arange(n, dtype=jnp.int32)


def _gather(x_pad, off, width):
    """x_pad (L, k), off (nb,) -> (nb, width, k)."""
    idx = off[:, None] + _iota(width)[None, :]
    return x_pad[idx]


def _scatter_add(y_pad, off, vals):
    """y_pad (L, k) += vals (nb, w, k) at rows off[:,None]+iota(w)."""
    idx = off[:, None] + _iota(vals.shape[1])[None, :]
    return y_pad.at[idx].add(vals)


@partial(jax.jit, static_argnames=("ny_pad", "trans", "sym"))
def apply_hmatrix_padded(data, x_pad, ny_pad: int, trans: str, sym: str):
    """Compute y_pad = H^(trans) @ x_pad over bucketed block data.

    data: dict with
      'dense': list of (D (nb,pt,ps), t_off (nb,), s_off (nb,), mirror (nb,) f)
      'lr':    list of (U (nb,pt,r), V (nb,r,ps), t_off, s_off, mirror)
    x_pad: (ns_pad, k) padded input (zeros in the pad region).
    trans: 'N' | 'T' | 'C'.  sym: 'N' | 'S' | 'H' (how mirrors transform).
    Returns y_pad (ny_pad, k).
    """
    dtype = jnp.result_type(x_pad.dtype,
                            *(d[0].dtype for d in data["dense"]),
                            *(u[0].dtype for u in data["lr"]))
    y = jnp.zeros((ny_pad, x_pad.shape[1]), dtype=dtype)

    def dense_term(D, xg):
        return jnp.einsum("nij,njk->nik", D, xg,
                          preferred_element_type=dtype, precision=_HI)

    def dense_term_t(D, xg, conj):
        Dc = jnp.conj(D) if conj else D
        return jnp.einsum("nij,nik->njk", Dc, xg,
                          preferred_element_type=dtype, precision=_HI)

    for D, t_off, s_off, mirror in data["dense"]:
        pt, ps = D.shape[1], D.shape[2]
        m = mirror.astype(dtype)[:, None, None]
        if trans == "N":
            y = _scatter_add(y, t_off, dense_term(D, _gather(x_pad, s_off, ps)))
            # mirror: sigma(D) at (s,t); sigma = T ('S') or H ('H')
            xg = _gather(x_pad, t_off, pt)
            y = _scatter_add(y, s_off,
                             dense_term_t(D, xg, conj=(sym == "H")) * m)
        elif trans == "T":
            y = _scatter_add(y, s_off,
                             dense_term_t(D, _gather(x_pad, t_off, pt), conj=False))
            xg = _gather(x_pad, s_off, ps)
            Dm = jnp.conj(D) if sym == "H" else D
            y = _scatter_add(y, t_off, dense_term(Dm, xg) * m)
        else:  # 'C'
            y = _scatter_add(y, s_off,
                             dense_term_t(D, _gather(x_pad, t_off, pt), conj=True))
            xg = _gather(x_pad, s_off, ps)
            Dm = D if sym == "H" else jnp.conj(D)
            y = _scatter_add(y, t_off, dense_term(Dm, xg) * m)

    # low-rank factors are stored rank-major: Ut (nb, r, pt), V (nb, r, ps).
    # TPU physical layout pads the minor-most dim to 128 lanes, so keeping
    # the (small) rank axis second-minor means rank-bucketed factors only
    # pad r to a multiple of 8 — the matvec streams ~what it stores.
    for Ut, V, t_off, s_off, mirror in data["lr"]:
        r, pt, ps = Ut.shape[1], Ut.shape[2], V.shape[2]
        m = mirror.astype(dtype)[:, None, None]
        if trans == "N":
            xg = _gather(x_pad, s_off, ps)
            w = jnp.einsum("nrj,njk->nrk", V, xg, preferred_element_type=dtype, precision=_HI)
            y = _scatter_add(y, t_off,
                             jnp.einsum("nri,nrk->nik", Ut, w,
                                        preferred_element_type=dtype, precision=_HI))
            # mirror: sigma(UV) = sigma(V) sigma(U) at (s,t)
            xg = _gather(x_pad, t_off, pt)
            Uc = jnp.conj(Ut) if sym == "H" else Ut
            Vc = jnp.conj(V) if sym == "H" else V
            w = jnp.einsum("nri,nik->nrk", Uc, xg, preferred_element_type=dtype, precision=_HI)
            y = _scatter_add(y, s_off,
                             jnp.einsum("nrj,nrk->njk", Vc, w,
                                        preferred_element_type=dtype, precision=_HI) * m)
        else:
            conj_main = trans == "C"
            Uc = jnp.conj(Ut) if conj_main else Ut
            Vc = jnp.conj(V) if conj_main else V
            xg = _gather(x_pad, t_off, pt)
            w = jnp.einsum("nri,nik->nrk", Uc, xg, preferred_element_type=dtype, precision=_HI)
            y = _scatter_add(y, s_off,
                             jnp.einsum("nrj,nrk->njk", Vc, w,
                                        preferred_element_type=dtype, precision=_HI))
            # mirror^(trans): for 'S': (UV)^T mirror -> UV at (t,s) under T;
            # composition handled by conj flags:
            conj_mirror = (sym == "H") != (trans == "C")
            Um = jnp.conj(Ut) if conj_mirror else Ut
            Vm = jnp.conj(V) if conj_mirror else V
            xg = _gather(x_pad, s_off, ps)
            w = jnp.einsum("nrj,njk->nrk", Vm, xg, preferred_element_type=dtype, precision=_HI)
            y = _scatter_add(y, t_off,
                             jnp.einsum("nri,nrk->nik", Um, w,
                                        preferred_element_type=dtype, precision=_HI) * m)

    return y


def resolve_backend(data, L: int, k: int, x_dtype) -> str:
    """Pick the product backend OUTSIDE any jit (so the choice is part of
    the compile key): Pallas kernels on TPU for real dtypes that fit VMEM
    (ops/pallas_matvec.py), the XLA gather/scatter path otherwise (CPU
    tests, f64 parity runs, complex)."""
    from ..config import get_config
    from .pallas_matvec import pallas_supported

    forced = get_config().matvec_backend
    if forced == "xla":
        return "xla"
    if forced == "pallas":
        return "pallas" if pallas_supported(data, L, k, x_dtype) else "xla"
    if jax.default_backend() == "tpu" and pallas_supported(data, L, k,
                                                           x_dtype):
        return "pallas"
    return "xla"


def apply_hmatrix(data, x_pad, ny_pad: int, trans: str, sym: str,
                  backend: str | None = None):
    """Backend-dispatched bucketed product (see resolve_backend)."""
    from .pallas_matvec import apply_hmatrix_pallas

    if backend is None:
        backend = resolve_backend(data, x_pad.shape[0], x_pad.shape[1],
                                  x_pad.dtype)
    if backend == "pallas":
        return apply_hmatrix_pallas(data, x_pad, ny_pad, trans, sym,
                                    interpret=jax.default_backend() != "tpu")
    return apply_hmatrix_padded(data, x_pad, ny_pad, trans, sym)


@partial(jax.jit, static_argnames=("pad_len", "trans", "sym", "nout",
                                   "backend"))
def apply_hmatrix_user(data, perm_in, inv_perm_out, x2d, pad_len: int,
                       trans: str, sym: str, nout: int,
                       backend: str | None = None):
    """End-to-end product in user numbering as ONE device program:
    permute in -> pad -> bucketed product -> un-permute.  Keeping the
    permutations inside the jit means a full matvec is a single dispatch
    and operands stay device-resident across Krylov iterations."""
    dtype = jnp.result_type(x2d.dtype,
                            *(d[0].dtype for d in data["dense"]),
                            *(u[0].dtype for u in data["lr"]))
    x_int = x2d[perm_in].astype(dtype)
    x_pad = jnp.zeros((pad_len, x2d.shape[1]), dtype=dtype)
    x_pad = x_pad.at[:x_int.shape[0]].set(x_int)
    y_pad = apply_hmatrix(data, x_pad, pad_len, trans, sym, backend)
    return y_pad[:nout][inv_perm_out]


def pack_bucket_data(dense_buckets, dense_arrays, lr_buckets, lr_arrays):
    """Build the pytree consumed by apply_hmatrix_padded from plan buckets
    (host numpy offsets) and device data arrays.

    Accepts low-rank factors as (U (nb, pt, r), V (nb, r, ps)) — the
    assembly-natural layout — and stores Ut (nb, r, pt): on TPU the
    minor-most axis is padded to 128 lanes, so the rank axis must be
    second-minor for rank-bucketed storage to actually save HBM."""
    dense = []
    for b, D in zip(dense_buckets, dense_arrays):
        dense.append((D, jnp.asarray(b.t_off), jnp.asarray(b.s_off),
                      jnp.asarray(b.mirror)))
    lr = []
    for b, (U, V) in zip(lr_buckets, lr_arrays):
        Ut = jnp.swapaxes(jnp.asarray(U), 1, 2)
        lr.append((Ut, jnp.asarray(V), jnp.asarray(b.t_off),
                   jnp.asarray(b.s_off), jnp.asarray(b.mirror)))
    return {"dense": dense, "lr": lr}


def padded_lengths(plan):
    """(ny_pad, ns_pad) covering every scatter/gather target of the plan,
    for both 'N' and transpose products (mirrors write to both sides)."""
    nt, ns = plan.nb_rows, plan.nb_cols
    max_pt = max([b.pt for b in plan.dense_buckets + plan.lowrank_buckets],
                 default=1)
    max_ps = max([b.ps for b in plan.dense_buckets + plan.lowrank_buckets],
                 default=1)
    pad = max(max_pt, max_ps)
    return nt + pad, ns + pad
