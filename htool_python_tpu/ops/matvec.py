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


# ----------------------------------------------------------------------
# Per-bucket block-term primitives.  These four functions are the SINGLE
# definition of how a bucket of blocks transforms gathered input segments
# — consumed by apply_hmatrix_padded below AND by the mesh-sharded
# operator (parallel/sharded.py), so the low-rank storage layout
# (rank-major Ut (nb, r, pt), V (nb, r, ps)) cannot silently diverge
# between the single-chip and multi-chip paths.
# ----------------------------------------------------------------------

def dense_block_term(D, xg, conj=False, dtype=None):
    """Apply dense blocks: D (nb,pt,ps) @ xg (nb,ps,k) -> (nb,pt,k)."""
    dtype = dtype or D.dtype
    Dm = jnp.conj(D) if conj else D
    return jnp.einsum("nij,njk->nik", Dm, xg,
                      preferred_element_type=dtype, precision=_HI)


def dense_block_term_t(D, xg, conj=False, dtype=None):
    """Apply transposed dense blocks: D^(T/H) with xg (nb,pt,k) -> (nb,ps,k).
    conj=True applies the conjugate transpose."""
    dtype = dtype or D.dtype
    Dm = jnp.conj(D) if conj else D
    return jnp.einsum("nij,nik->njk", Dm, xg,
                      preferred_element_type=dtype, precision=_HI)


def lowrank_block_term(Ut, V, xg, conj=False, dtype=None):
    """Apply low-rank blocks B = U V: Ut (nb,r,pt) RANK-MAJOR, V (nb,r,ps),
    xg (nb,ps,k) -> (nb,pt,k) via the two-stage contraction w = V x;
    y = U w."""
    dtype = dtype or Ut.dtype
    Um = jnp.conj(Ut) if conj else Ut
    Vm = jnp.conj(V) if conj else V
    w = jnp.einsum("nrj,njk->nrk", Vm, xg,
                   preferred_element_type=dtype, precision=_HI)
    return jnp.einsum("nri,nrk->nik", Um, w,
                      preferred_element_type=dtype, precision=_HI)


def lowrank_block_term_t(Ut, V, xg, conj=False, dtype=None):
    """Apply transposed low-rank blocks B^(T/H) = V^(T/H) U^(T/H):
    xg (nb,pt,k) -> (nb,ps,k)."""
    dtype = dtype or Ut.dtype
    Um = jnp.conj(Ut) if conj else Ut
    Vm = jnp.conj(V) if conj else V
    w = jnp.einsum("nri,nik->nrk", Um, xg,
                   preferred_element_type=dtype, precision=_HI)
    return jnp.einsum("nrj,nrk->njk", Vm, w,
                      preferred_element_type=dtype, precision=_HI)


@partial(jax.jit, static_argnames=("ny_pad", "trans", "sym"))
def apply_hmatrix_padded(data, x_pad, ny_pad: int, trans: str, sym: str):
    """Compute y_pad = H^(trans) @ x_pad over bucketed block data.

    data: dict with
      'dense': list of (D (nb,pt,ps), t_off (nb,), s_off (nb,), mirror (nb,) f)
      'lr':    list of (Ut (nb,r,pt) RANK-MAJOR, V (nb,r,ps), t_off, s_off,
               mirror)
    x_pad: (ns_pad, k) padded input (zeros in the pad region).
    trans: 'N' | 'T' | 'C'.  sym: 'N' | 'S' | 'H' (how mirrors transform).
    Returns y_pad (ny_pad, k).
    """
    dtype = jnp.result_type(x_pad.dtype,
                            *(d[0].dtype for d in data["dense"]),
                            *(u[0].dtype for u in data["lr"]))
    y = jnp.zeros((ny_pad, x_pad.shape[1]), dtype=dtype)
    conj_main = trans == "C"
    # mirror blocks transform by sigma = T ('S') / H ('H'); composing with
    # the product's own trans gives one conjugation flag:
    conj_mirror = (sym == "H") != (trans == "C")

    for D, t_off, s_off, mirror in data["dense"]:
        pt, ps = D.shape[1], D.shape[2]
        m = mirror.astype(dtype)[:, None, None]
        if trans == "N":
            y = _scatter_add(y, t_off,
                             dense_block_term(D, _gather(x_pad, s_off, ps),
                                              dtype=dtype))
            # mirror: sigma(D) at (s,t)
            xg = _gather(x_pad, t_off, pt)
            y = _scatter_add(y, s_off,
                             dense_block_term_t(D, xg, conj=(sym == "H"),
                                                dtype=dtype) * m)
        else:
            y = _scatter_add(y, s_off,
                             dense_block_term_t(D, _gather(x_pad, t_off, pt),
                                                conj=conj_main, dtype=dtype))
            xg = _gather(x_pad, s_off, ps)
            y = _scatter_add(y, t_off,
                             dense_block_term(D, xg, conj=conj_mirror,
                                              dtype=dtype) * m)

    # low-rank factors are stored rank-major: Ut (nb, r, pt), V (nb, r, ps).
    # TPU physical layout pads the minor-most dim to 128 lanes, so keeping
    # the (small) rank axis second-minor means rank-bucketed factors only
    # pad r to a multiple of 8 — the matvec streams ~what it stores.
    for Ut, V, t_off, s_off, mirror in data["lr"]:
        pt, ps = Ut.shape[2], V.shape[2]
        m = mirror.astype(dtype)[:, None, None]
        if trans == "N":
            xg = _gather(x_pad, s_off, ps)
            y = _scatter_add(y, t_off,
                             lowrank_block_term(Ut, V, xg, dtype=dtype))
            # mirror: sigma(UV) at (s,t)
            xg = _gather(x_pad, t_off, pt)
            y = _scatter_add(y, s_off,
                             lowrank_block_term_t(Ut, V, xg,
                                                  conj=(sym == "H"),
                                                  dtype=dtype) * m)
        else:
            xg = _gather(x_pad, t_off, pt)
            y = _scatter_add(y, s_off,
                             lowrank_block_term_t(Ut, V, xg, conj=conj_main,
                                                  dtype=dtype))
            xg = _gather(x_pad, s_off, ps)
            y = _scatter_add(y, t_off,
                             lowrank_block_term(Ut, V, xg, conj=conj_mirror,
                                                dtype=dtype) * m)

    return y


def is_planes(data) -> bool:
    """True for the {'cplanes': ...} plane-split marker pytree."""
    return isinstance(data, dict) and "cplanes" in data


def is_aligned(data) -> bool:
    """True for the {'aligned': ...} lane-aligned low-rank marker pytree."""
    return isinstance(data, dict) and "aligned" in data


def _align_win(w: int) -> int:
    """Aligned window width covering w + a <128 lane shift (the same
    extent the rotate path reads, ops/pallas_matvec.py _win_width)."""
    return -(-(w + 128) // 128) * 128


def align_lowrank(data):
    """Lane-aligned Pallas storage for the low-rank buckets: each block's
    factors are PRE-SHIFTED along the lane axis by (offset % 128) and the
    stored offsets rounded down to the 128 boundary, so the kernel's
    per-block x loads and y accumulations become aligned slices — no
    dynamic lane rotates at all (r04 attribution: the rotates cost ~0.9 ms
    of the 2.1 ms N=40000 product).  Costs ~128 extra lanes per factor
    (~+20% stored bytes on typical plans); dense buckets keep the rotate
    path (they are a small fraction of the stream)."""
    def shift(A, W, sh):
        nb, r, w = A.shape
        Ap = jnp.pad(A, ((0, 0), (0, 0), (0, W - w)))
        idx = (jnp.arange(W, dtype=jnp.int32)[None, :]
               - sh[:, None].astype(jnp.int32)) % W
        return jnp.take_along_axis(
            Ap, jnp.broadcast_to(idx[:, None, :], (nb, r, W)), axis=2)

    lr_al = []
    for Ut, V, t_off, s_off, mir in data["lr"]:
        pt, ps = Ut.shape[2], V.shape[2]
        Wt, Ws = _align_win(pt), _align_win(ps)
        t_off = jnp.asarray(t_off, jnp.int32)
        s_off = jnp.asarray(s_off, jnp.int32)
        U_al = shift(jnp.asarray(Ut), Wt, t_off % 128)
        V_al = shift(jnp.asarray(V), Ws, s_off % 128)
        lr_al.append((U_al, V_al, t_off - t_off % 128, s_off - s_off % 128,
                      mir))
    return {"aligned": {"dense": data["dense"], "lr": lr_al}}


def split_planes(data):
    """Split complex bucket data into re/im f32 plane pairs per leaf —
    the storage layout of the complex64 Pallas fast path (same total
    bytes as the complex original).

    The fused kernel streams both planes of each block once and forms the
    complex product with explicit cross terms (ops/pallas_matvec.py
    _cterm_fwd/_cterm_tr) — low-rank blocks need this, since
    Re(U V) = Re(U)Re(V) - Im(U)Im(V) does not decompose plane-wise."""
    def split(buckets):
        out = []
        for entry in buckets:
            *mats, t, s, m = entry
            planes = []
            for a in mats:
                planes.append(jnp.real(a).astype(jnp.float32))
                planes.append(jnp.imag(a).astype(jnp.float32))
            out.append(tuple(planes) + (t, s, m))
        return out

    return {"cplanes": {"dense": split(data["dense"]),
                        "lr": split(data["lr"])}}


def _apply_planes(cdata, x_pad, ny_pad: int, trans: str, sym: str,
                  interpret: bool):
    """Complex product through the plane-split fused kernel."""
    from .pallas_matvec import apply_hmatrix_pallas_complex

    return apply_hmatrix_pallas_complex(cdata, x_pad, ny_pad, trans,
                                        sym=sym, interpret=interpret)


def planes_supported(data, L: int, k: int, x_dtype, sym: str) -> bool:
    """complex64 Pallas fast path applicability: any symmetry ('H'
    mirrors run the conjugate-transpose plane term with a negated
    imaginary sign, csign_mirror) and the plane-pair windows must fit
    the kernel's VMEM budget."""
    from .pallas_matvec import _bucket_sizes, _vmem_model_bytes, \
        _VMEM_BUDGET

    dtypes = ([d[0].dtype for d in data["dense"]]
              + [u.dtype for u, *_ in data["lr"]])
    if not dtypes:
        return False
    if not all(dt == jnp.complex64 for dt in dtypes):
        return False
    if jnp.dtype(x_dtype) not in (jnp.dtype(jnp.complex64),
                                  jnp.dtype(jnp.float32)):
        return False
    vec_bytes = 2 * (2 * k) * max(L, 128) * 4
    sizes = _bucket_sizes(data, 8)  # plane pair = the full complex bytes
    return _vmem_model_bytes(sizes, vec_bytes) < _VMEM_BUDGET


def planes_fit(cdata, L: int, k: int) -> bool:
    """VMEM feasibility of the plane-split kernel for an ALREADY-SPLIT
    pytree at the actual RHS width k (the cached layout was validated at
    k=1 only — a later wide apply, e.g. HODLR peeling's 128-column
    chunks, needs ~2*(2k)*L*4 bytes of vector scratch)."""
    from .pallas_matvec import _VMEM_BUDGET, _vmem_model_bytes

    vec_bytes = 2 * (2 * k) * max(L, 128) * 4
    sizes = []
    for entry in cdata["dense"]:
        nb, pt, ps = entry[0].shape
        sizes.append((pt * ps * 8, nb))
    for entry in cdata["lr"]:
        Ur, Vr = entry[0], entry[2]
        sizes.append(((Ur.shape[1] * Ur.shape[2]
                       + Vr.shape[1] * Vr.shape[2]) * 8, Ur.shape[0]))
    return _vmem_model_bytes(sizes, vec_bytes) < _VMEM_BUDGET


def _max_fit_k(fit, k: int) -> int:
    """Largest power-of-two column-chunk width <= k the kernel fits;
    floors at 1 (the cached layouts were validated feasible at k=1)."""
    kc = k
    while kc > 1 and not fit(kc):
        kc //= 2
    return kc


def _apply_col_chunks(apply_one, x_pad, kc: int):
    """Run the kernel over column chunks of width kc and concatenate —
    the wide-RHS fallback when the whole (L, k) block would blow the
    kernel's VMEM vector scratch."""
    outs = [apply_one(x_pad[:, i:i + kc])
            for i in range(0, x_pad.shape[1], kc)]
    return jnp.concatenate(outs, axis=1)


def resolve_backend(data, L: int, k: int, x_dtype, sym: str = "N") -> str:
    """Pick the product backend OUTSIDE any jit (so the choice is part of
    the compile key): Pallas kernels on TPU for real f32 that fits VMEM
    (ops/pallas_matvec.py), the two-plane Pallas path for unsymmetric
    complex64, the XLA gather/scatter path otherwise (CPU tests, f64
    parity runs, symmetric complex)."""
    from ..config import get_config
    from .pallas_matvec import pallas_supported

    if is_planes(data):
        return "planes"
    if is_aligned(data):
        return "pallas"
    forced = get_config().matvec_backend
    if forced == "xla":
        return "xla"
    if forced == "pallas" or jax.default_backend() == "tpu":
        if pallas_supported(data, L, k, x_dtype):
            return "pallas"
        if planes_supported(data, L, k, x_dtype, sym):
            return "planes"
    return "xla"


def apply_hmatrix(data, x_pad, ny_pad: int, trans: str, sym: str,
                  backend: str | None = None):
    """Backend-dispatched bucketed product (see resolve_backend)."""
    from .pallas_matvec import apply_hmatrix_pallas

    from .pallas_matvec import pallas_supported

    if backend is None:
        backend = resolve_backend(data, x_pad.shape[0], x_pad.shape[1],
                                  x_pad.dtype, sym)
    interpret = jax.default_backend() != "tpu"
    L, k = x_pad.shape
    if backend == "planes":
        cdata = data["cplanes"] if is_planes(data) else \
            split_planes(data)["cplanes"]
        kc = _max_fit_k(lambda kk: planes_fit(cdata, L, kk), k)
        if kc < k:
            return _apply_col_chunks(
                lambda xc: _apply_planes(cdata, xc, ny_pad, trans, sym,
                                         interpret), x_pad, kc)
        return _apply_planes(cdata, x_pad, ny_pad, trans, sym, interpret)
    if is_planes(data):
        raise ValueError("plane-split data requires the 'planes' backend")
    if backend == "pallas":
        inner = data["aligned"] if is_aligned(data) else data
        kc = _max_fit_k(
            lambda kk: pallas_supported(inner, L, kk, x_pad.dtype), k)
        if kc < k:
            return _apply_col_chunks(
                lambda xc: apply_hmatrix_pallas(data, xc, ny_pad, trans,
                                                sym, interpret=interpret),
                x_pad, kc)
        return apply_hmatrix_pallas(data, x_pad, ny_pad, trans, sym,
                                    interpret=interpret)
    if is_aligned(data):
        raise ValueError("lane-aligned data requires the 'pallas' backend")
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
    if is_planes(data):
        dtype = jnp.result_type(x2d.dtype, jnp.complex64)
    else:
        inner = data["aligned"] if is_aligned(data) else data
        dtype = jnp.result_type(x2d.dtype,
                                *(d[0].dtype for d in inner["dense"]),
                                *(u[0].dtype for u in inner["lr"]))
    x_int = x2d[perm_in].astype(dtype)
    x_pad = jnp.zeros((pad_len, x2d.shape[1]), dtype=dtype)
    x_pad = x_pad.at[:x_int.shape[0]].set(x_int)
    y_pad = apply_hmatrix(data, x_pad, pad_len, trans, sym, backend)
    return y_pad[:nout][inv_perm_out]


class RankMajorFactors(tuple):
    """Marker for low-rank factors already in storage layout
    (Ut (nb, r, pt), V (nb, r, ps)) — produced by the fused assembly
    post-pass so pack_bucket_data skips the transpose."""

    __slots__ = ()

    def __new__(cls, Ut, V):
        return tuple.__new__(cls, (Ut, V))


def pack_bucket_data(dense_buckets, dense_arrays, lr_buckets, lr_arrays):
    """Build the pytree consumed by apply_hmatrix_padded from plan buckets
    (host numpy offsets) and device data arrays.

    Accepts low-rank factors as (U (nb, pt, r), V (nb, r, ps)) — the
    assembly-natural layout — or RankMajorFactors already transposed, and
    stores Ut (nb, r, pt): on TPU the minor-most axis is padded to 128
    lanes, so the rank axis must be second-minor for rank-bucketed storage
    to actually save HBM."""
    dense = []
    for b, D in zip(dense_buckets, dense_arrays):
        dense.append((D, jnp.asarray(b.t_off), jnp.asarray(b.s_off),
                      jnp.asarray(b.mirror)))
    lr = []
    for b, pair in zip(lr_buckets, lr_arrays):
        if isinstance(pair, RankMajorFactors):
            Ut, V = pair
            Ut = jnp.asarray(Ut)
        else:
            U, V = pair
            Ut = jnp.swapaxes(jnp.asarray(U), 1, 2)
        lr.append((Ut, jnp.asarray(V), jnp.asarray(b.t_off),
                   jnp.asarray(b.s_off), jnp.asarray(b.mirror)))
    return {"dense": dense, "lr": lr}


def padded_lengths(plan):
    """(ny_pad, ns_pad) covering every scatter/gather target of the plan,
    for both 'N' and transpose products (mirrors write to both sides).
    The extra 256 + round-to-128 covers the Pallas kernels' 128-aligned
    rotate windows (ops/pallas_matvec.py _win_width)."""
    nt, ns = plan.nb_rows, plan.nb_cols
    max_pt = max([b.pt for b in plan.dense_buckets + plan.lowrank_buckets],
                 default=1)
    max_ps = max([b.ps for b in plan.dense_buckets + plan.lowrank_buckets],
                 default=1)
    pad = max(max_pt, max_ps) + 256
    r128 = lambda v: -(-v // 128) * 128
    return r128(nt + pad), r128(ns + pad)
