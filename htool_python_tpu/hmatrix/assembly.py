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
from ..ops.matvec import RankMajorFactors
from .generator import VirtualGenerator
from .plan import BlockPlan, _bucketize

# buckets at most this many padded entries use dense-build + batched SVD
# instead of ACA on the device path (small blocks: SVD is exact and cheap)
_DENSE_SVD_MAX = 64 * 64

_PROFILE = bool(os.environ.get("HTOOL_TPU_PROFILE"))


# Per-phase wall-time breakdown of the LAST assemble() call (bench
# surfaces it as `assembly_breakdown`).  Phase walls are approximate where
# dispatch is async, but the ACA path syncs per chunk (rank pulls), so the
# split is close; `lr_pack_s` includes the rank-class packing dispatches.
ASSEMBLY_PROFILE: dict = {}


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
def _masked_blocks_jit(gen, dtype, ops, rows_idx, cols_idx, t_sz, s_sz):
    """Batched dense fill of one chunk, zeroed outside the actual sizes.
    `ops` carries the generator's device arrays as dynamic operands
    (ops/aca.py generator_operands — keeps HLO literal-free)."""
    from ..ops.aca import _gen_blocks
    D = _gen_blocks(gen, ops, rows_idx, cols_idx).astype(dtype)
    pt, ps = rows_idx.shape[1], cols_idx.shape[1]
    mask = ((jnp.arange(pt)[None, :, None] < t_sz[:, None, None])
            & (jnp.arange(ps)[None, None, :] < s_sz[:, None, None]))
    return jnp.where(mask, D, jnp.zeros((), dtype))


@partial(jax.jit, static_argnums=(0, 1))
def _dense_svd_lr_jit(gen, dtype, ops, rows_idx, cols_idx, t_sz, s_sz):
    """Small-block low-rank path: dense fill + batched SVD factors."""
    D = _masked_blocks_jit(gen, dtype, ops, rows_idx, cols_idx, t_sz, s_sz)
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

    ASSEMBLY_PROFILE.clear()
    t_all0 = time.perf_counter()
    # warm-up pays off where compiles/loads serialize over a remote link;
    # on CPU (tests) it would only add dummy work
    if use_device and jax.default_backend() == "tpu" and cfg.assembly_warmup:
        t0 = time.perf_counter()
        _warm_device_programs(plan, generator, epsilon, reqrank, dtype, cfg)
        ASSEMBLY_PROFILE["warmup_s"] = round(time.perf_counter() - t0, 3)

    ASSEMBLY_PROFILE["lr_aca_s"] = 0.0
    ASSEMBLY_PROFILE["lr_pack_s"] = 0.0
    for b in plan.lowrank_buckets:
        rows_idx = _bucket_user_indices(perm_t, t_base, b, "t")
        cols_idx = _bucket_user_indices(perm_s, s_base, b, "s")

        if use_device and low_rank_generator is None:
            t0 = time.perf_counter()
            chunks, ranks, ok, order, drop = _device_lr_bucket(
                generator, b, rows_idx, cols_idx, epsilon, reqrank, dtype, cfg)
            ASSEMBLY_PROFILE["lr_aca_s"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            # device rows may be re-ordered (and duplicated by the rmax
            # escalation ladder) — align the bucket's host arrays with them
            b = _subset_bucket(b, order)
            worth = ranks * (b.t_sz + b.s_sz) <= b.t_sz * b.s_sz
            keep = ok & worth & ~drop
            for i in np.flatnonzero(~keep & ~drop):
                densify_blocks.append((b.t_off[i], b.t_sz[i], b.s_off[i],
                                       b.s_sz[i], b.mirror[i]))
            if not keep.any():
                continue
            kept_idx = np.flatnonzero(keep)
            kept_ranks = ranks[kept_idx]
            class_list = list(_rank_classes(kept_ranks))
            widths = tuple(rc for rc, _ in class_list)
            # chunk-local selections (row order preserved: chunks cover the
            # global row range in ascending, disjoint slices)
            bounds = np.cumsum([0] + [c[0].shape[0] for c in chunks])
            class_sels = []
            for _, sk in class_list:
                gsel = kept_idx[sk]
                class_sels.append([
                    jnp.asarray((gsel[(gsel >= bounds[ci])
                                      & (gsel < bounds[ci + 1])]
                                 - bounds[ci]).astype(np.int32))
                    for ci in range(len(chunks))])
            outs = _pack_classes_jit(widths, [c[0] for c in chunks],
                                     [c[1] for c in chunks], class_sels)
            for (rclass, sk), (Ut_c, V_c) in zip(class_list, outs):
                kept_lr_buckets.append(_subset_bucket(b, kept_idx[sk]))
                lr_arrays.append(RankMajorFactors(Ut_c, V_c))
                lr_ranks.append(kept_ranks[sk].astype(np.int32))
            ASSEMBLY_PROFILE["lr_pack_s"] += time.perf_counter() - t0
            continue

        if low_rank_generator is not None:
            U, V, ranks, ok = _custom_lr_bucket(
                low_rank_generator, b, rows_idx, cols_idx, epsilon, dtype)
        else:
            U, V, ranks, ok = _host_lr_bucket(
                generator, b, perm_t, perm_s, t_base, s_base, epsilon,
                reqrank, dtype)

        ok = np.asarray(ok)
        ranks = np.asarray(ranks)
        # worthwhile check (actual sizes)
        worth = ranks * (b.t_sz + b.s_sz) <= b.t_sz * b.s_sz
        keep = ok & worth
        for i in np.flatnonzero(~keep):
            densify_blocks.append((b.t_off[i], b.t_sz[i], b.s_off[i],
                                   b.s_sz[i], b.mirror[i]))
        if not keep.any():
            continue
        if not keep.all():
            sel = np.flatnonzero(keep)
            b = _subset_bucket(b, sel)
            U = U[sel]
            V = V[sel]
            ranks = ranks[sel]
        # sub-bucket by rank class: the matvec streams the PADDED factor
        # arrays, so packing blocks of rank ~20 in a rank-128 bucket would
        # waste ~6x HBM bandwidth on zero columns
        for rclass, sel in _rank_classes(ranks):
            bb = b if len(sel) == b.nb else _subset_bucket(b, sel)
            Us = np.asarray(U[sel][:, :, :rclass], dtype=dtype)
            Vs = np.asarray(V[sel][:, :rclass, :], dtype=dtype)
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

    t_dense0 = time.perf_counter()
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
        from ..ops.aca import generator_operands
        gen_ops = generator_operands(generator)
        for b in dense_buckets:
            t0 = time.perf_counter()
            rows_idx = _bucket_user_indices(perm_t, t_base, b, "t")
            cols_idx = _bucket_user_indices(perm_s, s_base, b, "s")
            cap = _chunk_cap(b.pt * b.ps * 6, dtype.itemsize)
            Ds = []
            for i0, i1, size in _chunk_slices(b.nb, cap):
                ri, ci, tz, sz = _pad_chunk(rows_idx, cols_idx, b.t_sz,
                                            b.s_sz, i0, i1, size)
                Dc = _masked_blocks_jit(generator, np.dtype(dtype),
                                        gen_ops, ri, ci, tz, sz)
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

    if use_device and jnp is not None:
        jax.block_until_ready(dense_arrays)
    ASSEMBLY_PROFILE["dense_fill_s"] = round(
        time.perf_counter() - t_dense0, 3)
    for k in ("lr_aca_s", "lr_pack_s"):
        ASSEMBLY_PROFILE[k] = round(ASSEMBLY_PROFILE[k], 3)
    ASSEMBLY_PROFILE["total_s"] = round(time.perf_counter() - t_all0, 3)

    import dataclasses
    new_plan = dataclasses.replace(plan, dense_buckets=dense_buckets,
                                   lowrank_buckets=kept_lr_buckets)
    return new_plan, dense_arrays, lr_arrays, lr_ranks


def _rank_classes(ranks):
    """Partition block indices by rank class (multiples of 16 above 8,
    class 8 for tiny ranks): yields (rank_class, index array), ascending.

    Classes coarser than pow2 (which cost ~2x padded HBM on typical rank
    distributions) but coarser than the sublane granule 8 on purpose:
    every class is a separate Pallas bucket, and the fused kernel's
    per-grid-step cost scales with bucket count (r04 attribution) — 16-wide
    classes halve the low-rank bucket count for ~5-10% extra padded
    bytes, a net win for the streaming product."""
    ranks = np.asarray(ranks)
    r = np.maximum(ranks, 1)
    classes = np.where(r <= 8, 8, ((r + 15) // 16) * 16)
    for rc in np.unique(classes):
        yield int(rc), np.flatnonzero(classes == rc)


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


_WARMED: set = set()  # process-lifetime warm keys (see _warm_device_programs)


def _warm_device_programs(plan, gen, epsilon, reqrank, dtype, cfg) -> None:
    """Fire every jitted device program the buckets will need, from a
    thread pool, BEFORE the real assembly runs.

    Over a remote TPU link both cold XLA compiles (~0.5-10 s each) and
    persistent-cache executable loads (~0.4 s each) serialize at first
    use — profiled at 40-60 s of the N=16000 assembly.  The full program
    set is predictable from the plan (chunk sizes come from the 4x ladder,
    ops/aca.py _ladder_size), so warming them concurrently collapses that
    wall-clock to ~the slowest single compile.  Dummy inputs use zero
    block sizes: every lockstep loop exits immediately, so each warm call
    costs one trivial execution.

    Warm keys persist for the PROCESS (keyed by the jit static args:
    generator, epsilon, reqrank, dtype): a multi-partition build sweep
    (parallel/builders.py, one block row per partition) re-enters here P
    times with mostly-identical program sets, and re-warming an
    already-compiled program still pays a dispatch round-trip each —
    skipping them amortizes the warm-up across the whole sweep
    (reference analog: per-rank builds are independent MPI processes,
    src/htool/distributed_operator/utility.hpp:26-32)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..ops.aca import (_batched_aca_jit, _batched_truncate_jit,
                           generator_operands, truncate_eps_array)

    gen_ops = generator_operands(gen)
    eps_arr = truncate_eps_array(0.5 * epsilon)
    dtype = np.dtype(dtype)
    t0 = time.perf_counter()
    try:
        base_key = (hash(gen), float(epsilon), int(reqrank), dtype.str)
    except TypeError:  # unhashable generator: no cross-build sharing
        base_key = None

    jobs = []  # (kind, size, pt, ps, rmax_or_None)
    seen = set()

    def add(kind, size, pt, ps, rm=None):
        key = (kind, size, pt, ps, rm)
        if key not in seen:
            if base_key is not None and base_key + key in _WARMED:
                return
            seen.add(key)
            jobs.append(key)

    for b in plan.lowrank_buckets:
        if b.pt * b.ps <= _DENSE_SVD_MAX:
            cap = _chunk_cap(b.pt * b.ps * 32, dtype.itemsize)
            for _, _, size in _chunk_slices(b.nb, cap):
                add("svd", size, b.pt, b.ps)
        else:
            rmax = _bucket_rmax(b, cfg)
            stages = _aca_stages(rmax) if reqrank <= 0 else [rmax]
            for s_i, srm in enumerate(stages):
                cap = _chunk_cap((b.pt + b.ps) * (srm + 16) * 2,
                                 dtype.itemsize)
                if s_i == 0:
                    for _, _, size in _chunk_slices(b.nb, cap):
                        add("aca", size, b.pt, b.ps, srm)
                else:
                    # the stage-2 chunk size depends on how many blocks
                    # FAIL stage 1 (unknowable here): warm every ladder
                    # size it could resolve to
                    s = _stage2_chunk_size(b.nb, cap)
                    while True:
                        add("aca", s, b.pt, b.ps, srm)
                        if s <= 8:
                            break
                        s = max(8, s // 4)
    for b in plan.dense_buckets:
        cap = _chunk_cap(b.pt * b.ps * 6, dtype.itemsize)
        for _, _, size in _chunk_slices(b.nb, cap):
            add("dense", size, b.pt, b.ps)

    def run(job):
        kind, size, pt, ps, rm = job
        ri = jnp.zeros((size, pt), jnp.int32)
        ci = jnp.zeros((size, ps), jnp.int32)
        tz = jnp.zeros((size,), jnp.int32)
        sz = jnp.zeros((size,), jnp.int32)
        if kind == "dense":
            out = _masked_blocks_jit(gen, dtype, gen_ops, ri, ci, tz, sz)
        elif kind == "svd":
            Uc, Vc = _dense_svd_lr_jit(gen, dtype, gen_ops, ri, ci, tz, sz)
            r0 = jnp.zeros((size,), jnp.int32)
            out, _, _ = _batched_truncate_jit(int(reqrank), Uc, Vc, r0,
                                              eps_arr)
        else:
            Uc, Vc, rc, _ = _batched_aca_jit(
                gen, rm, 0.5 * float(epsilon), int(reqrank), dtype,
                gen_ops, ri, ci, tz, sz)
            out, _, _ = _batched_truncate_jit(int(reqrank), Uc, Vc, rc,
                                              eps_arr)
        jax.block_until_ready(out)

    if not jobs:
        return
    # each warm EXECUTION allocates its chunk's full workspace (shapes are
    # static even though the dummy blocks are zero-sized); complex64
    # chunks run ~0.5-1 GB each, so wide dtypes throttle the concurrency
    # to keep the transient warm-up footprint off the assembly's budget
    workers = min(16 if dtype.itemsize <= 4 else 4, len(jobs))
    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(run, jobs))
    if base_key is not None:
        _WARMED.update(base_key + key for key in jobs)
    if _PROFILE:
        print(f"[assemble] warm-up of {len(jobs)} device programs: "
              f"{time.perf_counter() - t0:.2f}s")


def _bucket_rmax(b, cfg) -> int:
    """ACA candidate-rank cap for a bucket.  The cap scales with block
    size: a (1024,1024) block densified at a flat rank-128 cap costs 1M
    stored entries where rank-256 factors would cost 512K — large
    admissible tiles deserve a higher ceiling (the escalation ladder means
    only genuinely high-rank blocks ever pay for it)."""
    rmax = max(8, int(min(b.pt, b.ps) * cfg.max_rank_ratio))
    hard = 128 if min(b.pt, b.ps) < 1024 else 256
    return min(rmax, b.pt, b.ps, hard)


def _aca_stages(rmax: int) -> list[int]:
    """rmax escalation ladder.  Most admissible blocks have rank far below
    the cap (e.g. median 11 vs cap 128 for (512,512) at eps=1e-3), and ACA's
    per-iteration cost is O(nb*(pt+ps)*rmax) HBM traffic on the padded
    factor state — so a cheap low-rank pass first, escalating only the
    unconverged blocks to the full cap, cuts the device time severalfold."""
    if rmax > 48:
        return [32, rmax]
    return [rmax]


def _stage2_chunk_size(nb: int, cap: int) -> int:
    """Fixed chunk size for escalation stages: the block count reaching
    stage 2 is data-dependent, so a SINGLE static size (padded with dead
    blocks that exit the lockstep loop immediately) keeps the compiled
    program set predictable for the parallel warm-up."""
    from ..ops.aca import _ladder_size
    return min(cap, _ladder_size(nb, cap))


@partial(jax.jit, static_argnames=("widths",))
def _pack_classes_jit(widths, chunk_Us, chunk_Vs, class_sels):
    """Fused assembly post-pass for one bucket, ONE device program: for
    every rank class, gather its blocks chunk by chunk (trimming / padding
    each chunk's factor width to the class width), concatenate along the
    block axis, and emit the STORAGE layout (rank-major Ut).

    Issued as a single jit call because the eager spelling (per-class
    gather + slice + astype + transpose) costs ~4 separate XLA programs
    per class — each a ~0.4 s compile/load over a remote TPU link — which
    round 2 profiling showed dominating the whole assembly.

    Gathering per chunk (class_sels[class][chunk] = chunk-local indices)
    rather than concatenating all chunks padded to the bucket-max width
    keeps the transient footprint at ~the FINAL compressed size: the old
    all-chunks-at-W concat peaked at nb * (pt + ps) * rmax — ~13 GB for
    the Helmholtz N=100k complex config (the r03 RESOURCE_EXHAUSTED)."""
    outs = []
    for w, parts in zip(widths, class_sels):
        ut_parts, v_parts = [], []
        for U, V, loc in zip(chunk_Us, chunk_Vs, parts):
            if loc.shape[0] == 0:
                continue
            cw = U.shape[2]
            Uw = U[loc]
            Vw = V[loc]
            if cw < w:
                Uw = jnp.pad(Uw, ((0, 0), (0, 0), (0, w - cw)))
                Vw = jnp.pad(Vw, ((0, 0), (0, w - cw), (0, 0)))
            else:
                Uw = Uw[:, :, :w]
                Vw = Vw[:, :w, :]
            ut_parts.append(jnp.swapaxes(Uw, 1, 2))  # (c, w, pt)
            v_parts.append(Vw)
        outs.append((
            ut_parts[0] if len(ut_parts) == 1 else jnp.concatenate(ut_parts),
            v_parts[0] if len(v_parts) == 1 else jnp.concatenate(v_parts)))
    return outs


def _device_lr_bucket(gen, b, rows_idx, cols_idx, epsilon, reqrank, dtype, cfg):
    """Device generator: batched ACA (or batched dense+SVD for small blocks).

    All device calls are chunked over the block axis, and SVD re-truncation
    is fused into each chunk so only *trimmed* factors accumulate — peak
    memory is bounded by the budget plus the final compressed size.

    Returns (chunks, ranks, ok, order, drop): `chunks` is a list of
    per-chunk device factor pairs (U (c, pt, w), V (c, w, ps)); the host
    arrays are aligned with their concatenation.  Rows are ordered by
    `order` (indices into the bucket's original blocks, possibly with
    DUPLICATES from the rmax escalation ladder); rows flagged `drop` are
    stage-N failures superseded by a later stage and must be neither kept
    nor densified."""
    from ..ops.aca import (_batched_aca_jit, _batched_truncate_jit,
                           generator_operands, truncate_eps_array)

    gen_ops = generator_operands(gen)
    t0 = time.perf_counter()
    # blockwise safety factor: partial ACA's running Frobenius estimate is
    # an underestimate, and SVD re-truncation adds its own eps-level error;
    # half-tolerance on both keeps the OPERATOR-level contract (rel err <
    # epsilon, reference tests/test_hmatrix.py:83) with margin
    eps_arr = truncate_eps_array(0.5 * epsilon)
    dtype = np.dtype(dtype)
    chunks = []
    order_parts: list[np.ndarray] = []
    drop_parts: list[np.ndarray] = []
    if b.pt * b.ps <= _DENSE_SVD_MAX:
        # batched SVD/eigh expands its operand ~an order of magnitude in
        # workspace (the round-1 OOM shape) — budget with a large fudge
        cap = _chunk_cap(b.pt * b.ps * 32, dtype.itemsize)
        for i0, i1, size in _chunk_slices(b.nb, cap):
            ri, ci, tz, sz = _pad_chunk(rows_idx, cols_idx, b.t_sz, b.s_sz,
                                        i0, i1, size)
            Uc, Vc = _dense_svd_lr_jit(gen, dtype, gen_ops, ri, ci, tz, sz)
            r0 = jnp.full((size,), Uc.shape[2], dtype=jnp.int32)
            Uc, Vc, rc = _batched_truncate_jit(int(reqrank), Uc, Vc, r0,
                                               eps_arr)
            rc = np.asarray(rc)[:i1 - i0]
            w = max(int(rc.max(initial=0)), 1)
            chunks.append((Uc[:i1 - i0, :, :w], Vc[:i1 - i0, :w, :], rc,
                           np.ones(i1 - i0, bool)))
            order_parts.append(np.arange(i0, i1))
            drop_parts.append(np.zeros(i1 - i0, bool))
    else:
        rmax = _bucket_rmax(b, cfg)
        stages = _aca_stages(rmax) if reqrank <= 0 else [rmax]
        remaining = np.arange(b.nb)
        for s_i, srm in enumerate(stages):
            last = s_i == len(stages) - 1
            cap = _chunk_cap((b.pt + b.ps) * (srm + 16) * 2,
                                 dtype.itemsize)
            ri_all, ci_all = rows_idx[remaining], cols_idx[remaining]
            tz_all, sz_all = b.t_sz[remaining], b.s_sz[remaining]
            fail_parts: list[np.ndarray] = []
            n_rem = len(remaining)
            s2 = _stage2_chunk_size(n_rem, cap) if s_i > 0 else None
            slices = ([(i0, min(i0 + s2, n_rem), s2)
                       for i0 in range(0, n_rem, s2)] if s2 is not None
                      else _chunk_slices(n_rem, cap))
            for i0, i1, size in slices:
                ri, ci, tz, sz = _pad_chunk(ri_all, ci_all, tz_all, sz_all,
                                            i0, i1, size)
                Uc, Vc, rc, okc = _batched_aca_jit(
                    gen, srm, 0.5 * float(epsilon), int(reqrank), dtype,
                    gen_ops, ri, ci, tz, sz)
                Uc, Vc, rc2 = _batched_truncate_jit(int(reqrank), Uc, Vc, rc,
                                                    eps_arr)
                ok_np = np.asarray(okc)[:i1 - i0]
                rc_np = np.asarray(rc2)[:i1 - i0]
                w = max(int(rc_np.max(initial=0)), 1)
                chunks.append((Uc[:i1 - i0, :, :w], Vc[:i1 - i0, :w, :],
                               rc_np, ok_np))
                order_parts.append(remaining[i0:i1])
                if last:
                    drop_parts.append(np.zeros(i1 - i0, bool))
                else:
                    # unconverged at this stage: superseded by the next
                    # stage's retry — never densified from THIS row
                    drop_parts.append(~ok_np)
                    fail_parts.append(remaining[i0:i1][~ok_np])
            if not last:
                remaining = (np.concatenate(fail_parts) if fail_parts
                             else np.zeros(0, np.int64))
                if len(remaining) == 0:
                    break
    out_chunks = [(U, V) for U, V, _, _ in chunks]
    ranks = np.concatenate([c[2] for c in chunks])
    ok = np.concatenate([c[3] for c in chunks])
    order = np.concatenate(order_parts)
    drop = np.concatenate(drop_parts)
    if _PROFILE:
        jax.block_until_ready(out_chunks)
        print(f"[assemble] lowrank bucket ({b.pt},{b.ps}) nb={b.nb}: "
              f"{time.perf_counter() - t0:.2f}s")
    return out_chunks, ranks, ok, order, drop
