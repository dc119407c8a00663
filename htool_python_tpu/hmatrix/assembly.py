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

import numpy as np

try:
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None

from ..config import get_config
from ..ops.aca import batched_aca, batched_truncate
from .generator import VirtualGenerator
from .plan import BlockPlan, _bucketize

# buckets at most this many padded entries use dense-build + batched SVD
# instead of ACA on the device path (small blocks: SVD is exact and cheap)
_DENSE_SVD_MAX = 64 * 64


def _is_device_generator(gen) -> bool:
    return hasattr(gen, "device_rows") and hasattr(gen, "device_cols")


def _pow2_pad(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _pad_nb(rows_idx, cols_idx, t_sz, s_sz):
    """Pad the batch dimension to a power of two with zero-size dummy blocks
    so device compiles are keyed by (pow2 nb, pt, ps) and reused across
    plans/partitions. Returns (rows_idx, cols_idx, t_sz, s_sz, real_nb)."""
    nb = len(t_sz)
    nb_pad = _pow2_pad(nb)
    if nb_pad == nb:
        return rows_idx, cols_idx, t_sz, s_sz, nb
    extra = nb_pad - nb
    rows_idx = np.concatenate([rows_idx, np.repeat(rows_idx[-1:], extra, 0)])
    cols_idx = np.concatenate([cols_idx, np.repeat(cols_idx[-1:], extra, 0)])
    t_sz = np.concatenate([t_sz, np.zeros(extra, t_sz.dtype)])
    s_sz = np.concatenate([s_sz, np.zeros(extra, s_sz.dtype)])
    return rows_idx, cols_idx, t_sz, s_sz, nb


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
    t_base, s_base = plan.target_offset, plan.source_offset

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
        if not keep.all():
            for i in np.flatnonzero(~keep):
                densify_blocks.append((b.t_off[i], b.t_sz[i], b.s_off[i],
                                       b.s_sz[i], b.mirror[i]))
            sel = np.flatnonzero(keep)
            b = _subset_bucket(b, sel)
            U = np.asarray(U)[sel]
            V = np.asarray(V)[sel]
            ranks = ranks[sel]
        # trim rank padding to bucket max
        rmaxb = max(int(ranks.max()), 1)
        U = jnp.asarray(np.asarray(U)[:, :, :rmaxb], dtype=dtype)
        V = jnp.asarray(np.asarray(V)[:, :rmaxb, :], dtype=dtype)
        kept_lr_buckets.append(b)
        lr_arrays.append((U, V))
        lr_ranks.append(ranks.astype(np.int32))

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
            rows_idx = _bucket_user_indices(perm_t, t_base, b, "t")
            cols_idx = _bucket_user_indices(perm_s, s_base, b, "s")
            rows_idx, cols_idx, t_sz_np, s_sz_np, real_nb = _pad_nb(
                rows_idx, cols_idx, b.t_sz, b.s_sz)
            D = generator.device_blocks(jnp.asarray(rows_idx),
                                        jnp.asarray(cols_idx)).astype(dtype)
            mask = ((np.arange(b.pt)[None, :, None] < t_sz_np[:, None, None])
                    & (np.arange(b.ps)[None, None, :] < s_sz_np[:, None, None]))
            D = D * jnp.asarray(mask, dtype=dtype)
            dense_arrays.append(D[:real_nb])
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
    """Device generator: batched ACA (or batched dense+SVD for small blocks)."""
    rows_idx, cols_idx, t_sz_np, s_sz_np, real_nb = _pad_nb(
        rows_idx, cols_idx, b.t_sz, b.s_sz)
    t_sz = jnp.asarray(t_sz_np)
    s_sz = jnp.asarray(s_sz_np)
    if b.pt * b.ps <= _DENSE_SVD_MAX:
        D = gen.device_blocks(jnp.asarray(rows_idx),
                              jnp.asarray(cols_idx)).astype(dtype)
        mask = ((np.arange(b.pt)[None, :, None] < t_sz_np[:, None, None])
                & (np.arange(b.ps)[None, None, :] < s_sz_np[:, None, None]))
        D = D * jnp.asarray(mask, dtype=dtype)
        U, S, Vh = jnp.linalg.svd(D, full_matrices=False)
        r = S.shape[1]
        U = (U * S[:, None, :]).astype(dtype)
        V = Vh.astype(dtype)
        ranks0 = jnp.full((len(t_sz_np),), r, dtype=jnp.int32)
        U, V, ranks = batched_truncate(U, V, ranks0, epsilon, reqrank)
        return (U[:real_nb], V[:real_nb], np.asarray(ranks)[:real_nb],
                np.ones(real_nb, bool))
    # cap the ACA candidate rank: admissible blocks needing more than this
    # are cheaper stored dense anyway (worthwhile check densifies them)
    rmax = max(8, int(min(b.pt, b.ps) * cfg.max_rank_ratio))
    rmax = min(rmax, b.pt, b.ps, 128)
    U, V, ranks, ok = batched_aca(gen, jnp.asarray(rows_idx),
                                  jnp.asarray(cols_idx), t_sz, s_sz,
                                  rmax, epsilon, reqrank, dtype)
    U, V, ranks = batched_truncate(U, V, ranks, epsilon, reqrank)
    return (U[:real_nb], V[:real_nb], np.asarray(ranks)[:real_nb],
            np.asarray(ok)[:real_nb])
