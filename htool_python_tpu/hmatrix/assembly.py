"""H-matrix assembly: fill dense buckets, compress admissible buckets.

Host-orchestrated (assembly is a one-shot setup phase with data-dependent
re-bucketing), device-executed where the generator allows it:

  * device generators (KernelGenerator / MatrixGenerator): batched ACA per
    bucket (ops/aca.py) + batched SVD re-truncation — or batched dense
    build + SVD for small buckets;
  * host generators (`VirtualGenerator.build_submatrix`, reference parity):
    per-block dense fill + numpy SVD truncation (the reference pays the
    same per-block Python crossing, call stack SURVEY.md §3.2);
  * custom hooks: `VirtualLowRankGenerator` (per-block user compression,
    False => densify) and `VirtualDenseBlocksGenerator` (ALL dense leaves
    in one batched callback).

Blocks whose compression fails or is not worthwhile
(rank*(m+n) > m*n, cf. example/advanced/define_custom_low_rank_generator.py:27)
are moved into the dense buckets before the dense fill.
"""

from __future__ import annotations

import os
import time
from functools import partial

import numpy as np

try:
    import jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jax = None
    jnp = None

from ..config import get_config
from ..ops.aca import _chunk_cap, _chunk_slices
from .generator import VirtualGenerator
from .plan import BlockPlan, _bucketize

# buckets at most this many padded entries use dense-build + batched SVD
# instead of ACA on the device path (small blocks: SVD is exact and cheap)
_DENSE_SVD_MAX = 64 * 64

_PROFILE = bool(os.environ.get("HTOOL_TPU_PROFILE"))


def _is_device_generator(gen) -> bool:
    return hasattr(gen, "device_rows") and hasattr(gen, "device_cols")


def _pad_chunk(rows_idx, cols_idx, t_sz, s_sz, i0, i1, size):
    """Slice [i0:i1) of a bucket's index/size arrays, padded to `size` with
    zero-size dummy blocks (valid clamped indices, so device evals stay in
    bounds). Returns jnp arrays."""
    c = i1 - i0
    if size == c:
        ri, ci = rows_idx[i0:i1], cols_idx[i0:i1]
        tz, sz = t_sz[i0:i1], s_sz[i0:i1]
    else:
        ri = np.repeat(rows_idx[i1 - 1:i1], size, 0)
        ci = np.repeat(cols_idx[i1 - 1:i1], size, 0)
        tz = np.zeros(size, t_sz.dtype)
        sz = np.zeros(size, s_sz.dtype)
        ri[:c], ci[:c] = rows_idx[i0:i1], cols_idx[i0:i1]
        tz[:c], sz[:c] = t_sz[i0:i1], s_sz[i0:i1]
    return (jnp.asarray(ri), jnp.asarray(ci),
            jnp.asarray(tz.astype(np.int32)), jnp.asarray(sz.astype(np.int32)))


@partial(jax.jit, static_argnums=(0, 1))
def _masked_blocks_jit(gen, dtype, rows_idx, cols_idx, t_sz, s_sz):
    """Batched dense fill of one chunk, zeroed outside the actual sizes."""
    D = gen.device_blocks(rows_idx, cols_idx).astype(dtype)
    pt, ps = rows_idx.shape[1], cols_idx.shape[1]
    mask = ((jnp.arange(pt)[None, :, None] < t_sz[:, None, None])
            & (jnp.arange(ps)[None, None, :] < s_sz[:, None, None]))
    return jnp.where(mask, D, jnp.zeros((), dtype))


@partial(jax.jit, static_argnums=(0, 1))
def _dense_svd_lr_jit(gen, dtype, rows_idx, cols_idx, t_sz, s_sz):
    """Small-block low-rank path: dense fill + batched SVD factors."""
    D = _masked_blocks_jit(gen, dtype, rows_idx, cols_idx, t_sz, s_sz)
    U, S, Vh = jnp.linalg.svd(D, full_matrices=False)
    return (U * S[:, None, :]).astype(dtype), Vh.astype(dtype)


def _user_indices(perm, base, off, sz, width):
    """Padded user-index row (width,) for one block, clamped in pad region."""
    idx = np.minimum(np.arange(width) + off, off + sz - 1) + base
    return perm[idx]


def _bucket_user_indices(perm, base, b, side):
    off = b.t_off if side == "t" else b.s_off
    sz = b.t_sz if side == "t" else b.s_sz
    width = b.pt if side == "t" else b.ps
    pos = np.minimum(np.arange(width)[None, :], (sz - 1)[:, None]) + off[:, None]
    return np.asarray(perm[pos + base], dtype=np.int32)


def _host_truncate(mat, eps, reqrank):
    """numpy SVD truncation; returns (U, V) or None if not worthwhile."""
    u, s, vh = np.linalg.svd(mat, full_matrices=False)
    if reqrank > 0:
        r = min(reqrank, len(s))
    else:
        s2 = s * s
        total = s2.sum()
        if total == 0:
            r = 0
        else:
            tail = np.cumsum(s2[::-1])[::-1]
            r = int(np.sum(tail > eps * eps * total))
    m, n = mat.shape
    if r * (m + n) > m * n:
        return None
    return u[:, :r] * s[:r], vh[:r, :]


def assemble(plan: BlockPlan, generator, epsilon: float, reqrank: int = -1,
             low_rank_generator=None, dense_blocks_generator=None, dtype=None):
    """Returns (new_plan, dense_arrays, lr_arrays, lr_ranks).

    dense_arrays[i] : (nb, pt, ps) device array for new_plan.dense_buckets[i]
    lr_arrays[i]    : (U (nb,pt,r), V (nb,r,ps)) for new_plan.lowrank_buckets[i]
    lr_ranks[i]     : (nb,) int32 actual ranks
    """
    cfg = get_config()
    if dtype is None:
        dtype = cfg.default_dtype(getattr(generator, "is_complex", False))
    dtype = np.dtype(dtype)

    perm_t = plan.target_root.get_permutation()
    perm_s = plan.source_root.get_permutation()
    if isinstance(generator, VirtualGenerator):
        if generator.target_permutation is not None:
            perm_t = generator.target_permutation
        if generator.source_permutation is not None:
            perm_s = generator.source_permutation
    # symmetric block-row plans store t_off in absolute coordinates
    t_base = 0 if plan.t_off_absolute else plan.target_offset
    s_base = plan.source_offset

    kept_lr_buckets, lr_arrays, lr_ranks = [], [], []
    densify_blocks: list[tuple] = []

    use_device = (_is_device_generator(generator)
                  and low_rank_generator is None and jnp is not None)

    for b in plan.lowrank_buckets:
        rows_idx = _bucket_user_indices(perm_t, t_base, b, "t")
        cols_idx = _bucket_user_indices(perm_s, s_base, b, "s")

        if low_rank_generator is not None:
            U, V, ranks, ok = _custom_lr_bucket(
                low_rank_generator, b, rows_idx, cols_idx, epsilon, dtype)
        elif use_device:
            U, V, ranks, ok = _device_lr_bucket(
                generator, b, rows_idx, cols_idx, epsilon, reqrank, dtype, cfg)
        else:
            U, V, ranks, ok = _host_lr_bucket(
                generator, b, perm_t, perm_s, t_base, s_base, epsilon,
                reqrank, dtype)

        ok = np.asarray(ok)
        ranks = np.asarray(ranks)
        # worthwhile check (actual sizes)
        worth = ranks * (b.t_sz + b.s_sz) <= b.t_sz * b.s_sz
        keep = ok & worth
        if not keep.any():
            for i in np.flatnonzero(~keep):
                densify_blocks.append((b.t_off[i], b.t_sz[i], b.s_off[i],
                                       b.s_sz[i], b.mirror[i]))
            continue
        U = jnp.asarray(U)
        V = jnp.asarray(V)
        if not keep.all():
            for i in np.flatnonzero(~keep):
                densify_blocks.append((b.t_off[i], b.t_sz[i], b.s_off[i],
                                       b.s_sz[i], b.mirror[i]))
            sel = np.flatnonzero(keep)
            b = _subset_bucket(b, sel)
            U = U[sel]
            V = V[sel]
            ranks = ranks[sel]
        # sub-bucket by rank class (pow2 ceiling): the matvec streams the
        # PADDED factor arrays, so packing blocks of rank ~20 in a
        # rank-128 bucket would waste ~6x HBM bandwidth on zero columns
        for rclass, sel in _rank_classes(ranks):
            bb = b if len(sel) == b.nb else _subset_bucket(b, sel)
            Us = U[sel][:, :, :rclass].astype(dtype)
            Vs = V[sel][:, :rclass, :].astype(dtype)
            kept_lr_buckets.append(bb)
            lr_arrays.append((Us, Vs))
            lr_ranks.append(ranks[sel].astype(np.int32))

    # --- dense buckets (original + densified) ---
    dense_tuples = []
    for b in plan.dense_buckets:
        for i in range(b.nb):
            dense_tuples.append((b.t_off[i], b.t_sz[i], b.s_off[i],
                                 b.s_sz[i], b.mirror[i]))
    dense_tuples.extend(densify_blocks)
    dense_buckets = _bucketize(dense_tuples)

    dense_arrays = []
    if dense_blocks_generator is not None:
        # reference semantics: ONE callback with every dense leaf
        all_rows, all_cols, all_mats = [], [], []
        for b in dense_buckets:
            for i in range(b.nb):
                r0 = t_base + b.t_off[i]
                c0 = s_base + b.s_off[i]
                all_rows.append(perm_t[r0:r0 + b.t_sz[i]])
                all_cols.append(perm_s[c0:c0 + b.s_sz[i]])
                all_mats.append(np.zeros((b.t_sz[i], b.s_sz[i]),
                                         dtype=dtype, order="F"))
        dense_blocks_generator.build_dense_blocks(all_rows, all_cols, all_mats)
        it = iter(all_mats)
        for b in dense_buckets:
            D = np.zeros((b.nb, b.pt, b.ps), dtype=dtype)
            for i in range(b.nb):
                m = next(it)
                D[i, :b.t_sz[i], :b.s_sz[i]] = m
            dense_arrays.append(jnp.asarray(D))
    elif use_device:
        for b in dense_buckets:
            t0 = time.perf_counter()
            rows_idx = _bucket_user_indices(perm_t, t_base, b, "t")
            cols_idx = _bucket_user_indices(perm_s, s_base, b, "s")
            cap = _chunk_cap(b.pt * b.ps * 6)
            Ds = []
            for i0, i1, size in _chunk_slices(b.nb, cap):
                ri, ci, tz, sz = _pad_chunk(rows_idx, cols_idx, b.t_sz,
                                            b.s_sz, i0, i1, size)
                Dc = _masked_blocks_jit(generator, np.dtype(dtype),
                                        ri, ci, tz, sz)
                Ds.append(Dc[:i1 - i0])
            dense_arrays.append(Ds[0] if len(Ds) == 1 else jnp.concatenate(Ds))
            if _PROFILE:
                dense_arrays[-1].block_until_ready()
                print(f"[assemble] dense bucket ({b.pt},{b.ps}) nb={b.nb}: "
                      f"{time.perf_counter() - t0:.2f}s")
    else:
        for b in dense_buckets:
            D = np.zeros((b.nb, b.pt, b.ps), dtype=dtype)
            for i in range(b.nb):
                r0 = t_base + b.t_off[i]
                c0 = s_base + b.s_off[i]
                mat = np.zeros((b.t_sz[i], b.s_sz[i]), dtype=dtype, order="F")
                generator.build_submatrix(perm_t[r0:r0 + b.t_sz[i]],
                                          perm_s[c0:c0 + b.s_sz[i]], mat)
                D[i, :b.t_sz[i], :b.s_sz[i]] = mat
            dense_arrays.append(jnp.asarray(D))

    import dataclasses
    new_plan = dataclasses.replace(plan, dense_buckets=dense_buckets,
                                   lowrank_buckets=kept_lr_buckets)
    return new_plan, dense_arrays, lr_arrays, lr_ranks


def _rank_classes(ranks):
    """Partition block indices by pow2-ceiling rank class (min 8): yields
    (rank_class, index array), ascending."""
    ranks = np.asarray(ranks)
    classes = np.maximum(8, np.vectorize(_pow2_ceil_int)(
        np.maximum(ranks, 1)))
    for rc in np.unique(classes):
        yield int(rc), np.flatnonzero(classes == rc)


def _pow2_ceil_int(n):
    p = 1
    while p < n:
        p *= 2
    return p


def _subset_bucket(b, sel):
    import dataclasses
    return dataclasses.replace(
        b, t_off=b.t_off[sel], s_off=b.s_off[sel],
        t_sz=b.t_sz[sel], s_sz=b.s_sz[sel], mirror=b.mirror[sel])


def _custom_lr_bucket(lrg, b, rows_idx, cols_idx, epsilon, dtype):
    """User VirtualLowRankGenerator: per-block callback, False => densify."""
    rmax = 1
    Us, Vs, ranks, ok = [], [], np.zeros(b.nb, np.int32), np.zeros(b.nb, bool)
    for i in range(b.nb):
        rows = rows_idx[i, :b.t_sz[i]].astype(np.int64)
        cols = cols_idx[i, :b.s_sz[i]].astype(np.int64)
        success = lrg.build_low_rank_approximation(rows, cols, epsilon)
        if success:
            U, V = lrg.take_uv()
            Us.append(U)
            Vs.append(V)
            ranks[i] = U.shape[1]
            ok[i] = True
            rmax = max(rmax, U.shape[1])
        else:
            Us.append(None)
            Vs.append(None)
    Uarr = np.zeros((b.nb, b.pt, rmax), dtype=dtype)
    Varr = np.zeros((b.nb, rmax, b.ps), dtype=dtype)
    for i in range(b.nb):
        if ok[i]:
            Uarr[i, :b.t_sz[i], :ranks[i]] = Us[i]
            Varr[i, :ranks[i], :b.s_sz[i]] = Vs[i]
    return Uarr, Varr, ranks, ok


def _host_lr_bucket(gen, b, perm_t, perm_s, t_base, s_base, epsilon,
                    reqrank, dtype):
    """Host generator: dense fill + numpy SVD truncation per block."""
    rmax = 1
    Us, Vs = [], []
    ranks = np.zeros(b.nb, np.int32)
    ok = np.zeros(b.nb, bool)
    for i in range(b.nb):
        r0, c0 = t_base + b.t_off[i], s_base + b.s_off[i]
        rows = perm_t[r0:r0 + b.t_sz[i]]
        cols = perm_s[c0:c0 + b.s_sz[i]]
        mat = np.zeros((b.t_sz[i], b.s_sz[i]), dtype=dtype, order="F")
        gen.build_submatrix(rows, cols, mat)
        uv = _host_truncate(mat, epsilon, reqrank)
        if uv is None:
            Us.append(None)
            Vs.append(None)
            continue
        U, V = uv
        Us.append(U)
        Vs.append(V)
        ranks[i] = U.shape[1]
        ok[i] = True
        rmax = max(rmax, U.shape[1])
    Uarr = np.zeros((b.nb, b.pt, rmax), dtype=dtype)
    Varr = np.zeros((b.nb, rmax, b.ps), dtype=dtype)
    for i in range(b.nb):
        if ok[i]:
            Uarr[i, :b.t_sz[i], :ranks[i]] = Us[i]
            Varr[i, :ranks[i], :b.s_sz[i]] = Vs[i]
    return Uarr, Varr, ranks, ok


def _device_lr_bucket(gen, b, rows_idx, cols_idx, epsilon, reqrank, dtype, cfg):
    """Device generator: batched ACA (or batched dense+SVD for small blocks).

    All device calls are chunked over the block axis, and SVD re-truncation
    is fused into each chunk so only *trimmed* factors accumulate — peak
    memory is bounded by the budget plus the final compressed size."""
    from ..ops.aca import (_batched_aca_jit, _batched_truncate_jit,
                           concat_rank_chunks, truncate_eps_array)

    t0 = time.perf_counter()
    # blockwise safety factor: partial ACA's running Frobenius estimate is
    # an underestimate, and SVD re-truncation adds its own eps-level error;
    # half-tolerance on both keeps the OPERATOR-level contract (rel err <
    # epsilon, reference tests/test_hmatrix.py:83) with margin
    eps_arr = truncate_eps_array(0.5 * epsilon)
    dtype = np.dtype(dtype)
    chunks = []
    if b.pt * b.ps <= _DENSE_SVD_MAX:
        # batched SVD/eigh expands its operand ~an order of magnitude in
        # workspace (the round-1 OOM shape) — budget with a large fudge
        cap = _chunk_cap(b.pt * b.ps * 32)
        for i0, i1, size in _chunk_slices(b.nb, cap):
            ri, ci, tz, sz = _pad_chunk(rows_idx, cols_idx, b.t_sz, b.s_sz,
                                        i0, i1, size)
            Uc, Vc = _dense_svd_lr_jit(gen, dtype, ri, ci, tz, sz)
            r0 = jnp.full((size,), Uc.shape[2], dtype=jnp.int32)
            Uc, Vc, rc = _batched_truncate_jit(int(reqrank), Uc, Vc, r0,
                                               eps_arr)
            rc = np.asarray(rc)[:i1 - i0]
            w = max(int(rc.max(initial=0)), 1)
            chunks.append((Uc[:i1 - i0, :, :w], Vc[:i1 - i0, :w, :], rc,
                           np.ones(i1 - i0, bool)))
    else:
        # cap the ACA candidate rank: admissible blocks needing more than
        # this are cheaper stored dense anyway (worthwhile check densifies)
        rmax = max(8, int(min(b.pt, b.ps) * cfg.max_rank_ratio))
        rmax = min(rmax, b.pt, b.ps, 128)
        cap = _chunk_cap((b.pt + b.ps) * (rmax + 16) * 2)
        for i0, i1, size in _chunk_slices(b.nb, cap):
            ri, ci, tz, sz = _pad_chunk(rows_idx, cols_idx, b.t_sz, b.s_sz,
                                        i0, i1, size)
            Uc, Vc, rc, okc = _batched_aca_jit(
                gen, rmax, 0.5 * float(epsilon), int(reqrank), dtype,
                ri, ci, tz, sz)
            Uc, Vc, rc = _batched_truncate_jit(int(reqrank), Uc, Vc, rc,
                                               eps_arr)
            rc = np.asarray(rc)[:i1 - i0]
            w = max(int(rc.max(initial=0)), 1)
            chunks.append((Uc[:i1 - i0, :, :w], Vc[:i1 - i0, :w, :], rc,
                           np.asarray(okc)[:i1 - i0]))
    out = concat_rank_chunks(chunks, dtype)
    if _PROFILE:
        out[0].block_until_ready()
        print(f"[assemble] lowrank bucket ({b.pt},{b.ps}) nb={b.nb}: "
              f"{time.perf_counter() - t0:.2f}s")
    return out
