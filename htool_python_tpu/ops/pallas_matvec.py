"""Pallas TPU kernels for the bucketed H-matrix product (the hot path).

TPU-native replacement for the XLA gather/scatter formulation in
ops/matvec.py (reference contract: `add_hmatrix_vector_product`,
src/htool/hmatrix/hmatrix.hpp:96-139).  XLA lowers the per-bucket
gather -> batched-GEMM -> scatter-add onto TPU scatter loops that run ~40x
off the HBM roofline; these kernels instead stream each bucket's block
data HBM -> VMEM (auto double-buffered by the Pallas pipeline), keep the
*whole* padded input and output vectors resident in VMEM in a transposed
(k, L) layout (minor dim = L, so a column vector does not explode to 128
lanes per element), and accumulate output segments in VMEM across the
sequential grid.  Per block the work is one (k, ps) x (ps, pt) MXU
contraction; the kernel is bandwidth-bound on the block data, which is
read exactly once at streaming rate.

Scalar block offsets ride the scalar-prefetch channel
(`pltpu.PrefetchScalarGridSpec`), so the pipeline can compute VMEM slices
before each grid step.

Real dtypes only ('T' == 'C' and 'S' == 'H' then); complex falls back to
the XLA path in the dispatcher (ops/matvec.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for x + y + every bucket's double-buffered step blocks
# (v5e has 128 MB VMEM per core; leave headroom for Mosaic scratch).
# Larger windows = fewer grid steps; per-step cost dominates the product
# (r04 attribution), so spend VMEM on window size.
_VMEM_BUDGET = 88 * 1024 * 1024


# Contraction engine choice.  With few RHS columns (k < _MXU_MIN_K) each
# per-block dot is a (k, ps) x (ps, pt) sliver: the MXU pays its full
# pipeline latency (plus the multi-pass f32 emulation) for 1/128th of its
# throughput, and the serialized per-block dots — not HBM bandwidth —
# dominate the product (r03 measurement: halving stored bytes left the
# matvec time unchanged).  Small k instead computes broadcast-multiply +
# axis-reduce on the VPU, batched over the whole grid step's blocks (see
# _term_fwd/_term_tr); large k keeps batched MXU dots (they amortize
# across columns).
_MXU_MIN_K = 8


# Timing probes for tools/profile_matvec2/4.py — they produce WRONG results
# and exist only to attribute kernel time (rotate cost / dynamic-address
# cost / term compute); production entry points never set them.
_PROF_NO_ROTATE = False     # skip lane rotates in load/accum
_PROF_STATIC_OFF = False    # ignore offsets entirely (slice at 0)
_PROF_STATIC_LOAD = False   # static x windows only
_PROF_STATIC_ACCUM = False  # static y windows only
_PROF_SKIP_TERM = False     # replace the block math with a cheap stand-in


# Mosaic requires dynamic lane-dimension slice offsets to be provable
# multiples of 128, but H-matrix block offsets are arbitrary cluster-tree
# offsets.  Standard TPU trick: slice a 128-extended window at the aligned
# base and dynamic-rotate (tpu.DynamicRotate) by the residual — a cheap VPU
# lane shuffle of a (k, width+128) tile.

def _win_width(width: int) -> int:
    """Aligned window size covering width + a <128 shift: Mosaic's
    tpu.dynamic_rotate requires the rotated vector's lane extent to be a
    multiple of 128 (e.g. a 448-lane window fails to compile)."""
    return -(-(width + 128) // 128) * 128


def _load_seg(x_ref, off, width: int):
    """x_ref[:, off:off+width] with an arbitrary dynamic offset."""
    if _PROF_STATIC_OFF or _PROF_STATIC_LOAD:
        return x_ref[:, :width]
    W = _win_width(width)
    base = pl.multiple_of((off // 128) * 128, 128)
    win = x_ref[:, pl.ds(base, W)]
    if _PROF_NO_ROTATE:
        return win[:, :width]
    sh = off - base  # 0..127
    return pltpu.roll(win, W - sh, 1)[:, :width]


def _load_al(x_ref, off, width: int):
    """x_ref[:, off:off+width] where off is a known 128 multiple (the
    lane-aligned storage layout, ops/matvec.py align_lowrank)."""
    return x_ref[:, pl.ds(pl.multiple_of(off, 128), width)]


def _accum_al(y_ref, off, width: int, acc):
    """y_ref[:, off:off+width] += acc at a 128-aligned offset."""
    base = pl.multiple_of(off, 128)
    y_ref[:, pl.ds(base, width)] = y_ref[:, pl.ds(base, width)] + acc


def _accum_seg(y_ref, off, width: int, acc):
    """y_ref[:, off:off+width] += acc with an arbitrary dynamic offset."""
    if _PROF_STATIC_OFF or _PROF_STATIC_ACCUM:
        y_ref[:, :width] = y_ref[:, :width] + acc
        return
    W = _win_width(width)
    base = pl.multiple_of((off // 128) * 128, 128)
    win = y_ref[:, pl.ds(base, W)]
    buf = jnp.pad(acc, ((0, 0), (0, W - acc.shape[1])))
    if _PROF_NO_ROTATE:
        y_ref[:, pl.ds(base, W)] = win + buf
        return
    sh = off - base
    y_ref[:, pl.ds(base, W)] = win + pltpu.roll(buf, sh, 1)


# target bytes of block data per grid step: large enough to amortize the
# per-step pipeline overhead (r04 attribution: ~0.85 us fixed cost per
# step — 256K steps left 1.1 ms on the table at N=40000), small enough
# that every bucket's double-buffered window still fits VMEM (the budget
# is shared across buckets, see _step_bytes_budget)
_STEP_BYTES = 1 << 20

# unroll bound for the per-step block loop (the gather/scatter rotates are
# per-block; the compute is batched across the whole step)
import os as _os_env

_MAX_GROUP = int(_os_env.environ.get("HTOOL_FUSED_MAX_GROUP", 96))

# byte-weighted window sizing (round 5): equal VMEM splitting starved the
# buckets that carry the data — the N=40000 plan's 15 equal ~1 MB windows
# gave 426 grid steps at ~4.9 us each (2.07 ms total) while a uniform
# single-bucket product with large windows runs at 718 GB/s
# (tools/profile_matvec5_result.json).  Weighting windows by each
# bucket's share of the stored bytes cuts the step count ~3.5x.
_STEP_FLOOR = 1 << 18
_STEP_CAP = int(_os_env.environ.get("HTOOL_FUSED_STEP_CAP", 8 << 20))


def _weighted_step_budgets(entries) -> list[int]:
    """Per-bucket step-window byte targets proportional to bucket bytes."""
    sizes = []
    for kind, blocks, *_ in entries:
        per = sum(int(np.prod(b.shape[1:])) * b.dtype.itemsize
                  for b in blocks)
        sizes.append((per, per * blocks[0].shape[0]))
    total = sum(t for _, t in sizes) or 1
    budget = _VMEM_BUDGET * 2 // 5
    return [max(_STEP_FLOOR, min(_STEP_CAP, budget * b_bytes // total))
            for _, b_bytes in sizes]


def _step_bytes_budget(n_buckets: int) -> int:
    """Per-bucket step-window byte target: the fused kernel keeps every
    bucket's double-buffered step window resident at once, so the VMEM
    budget is split across buckets (floor 256K keeps steps amortized)."""
    share = (_VMEM_BUDGET * 2 // 5) // max(n_buckets, 1)
    return max(1 << 18, min(_STEP_BYTES, share))


def _group_size(per_block_bytes: int, nb: int, step_bytes: int) -> int:
    G = max(1, step_bytes // max(per_block_bytes, 1))
    return int(min(G, _MAX_GROUP, nb))


def _bucket_sizes(data, itemsize):
    """(per_block_bytes, nb) per bucket, dense first then low-rank (the
    iteration order apply_hmatrix_pallas uses)."""
    out = []
    for d in data["dense"]:
        nb, pt, ps = d[0].shape
        out.append((pt * ps * itemsize, nb))
    for u, v, *_ in data["lr"]:
        nb = u.shape[0]
        out.append(((u.shape[1] * u.shape[2] + v.shape[1] * v.shape[2])
                    * itemsize, nb))
    return out


def _vmem_model_bytes(sizes, vec_bytes: int) -> int:
    """Peak VMEM estimate for the active kernel structure: the sequential
    kernel (TPU default) holds ONE double-buffered bucket window at a
    time (scoped emit_pipeline allocations); the outer-grid fused kernel
    holds every bucket's window simultaneously."""
    import jax as _j

    from ..config import get_config

    mode = get_config().matvec_kernel_mode \
        if _j.default_backend() == "tpu" else "fused"
    if mode == "seq":
        win = 0
        for per, nb in sizes:
            G = int(min(_SEQ_MAX_GROUP, max(1, _SEQ_STEP_BYTES // per),
                        max(nb, 1)))
            win = max(win, G * per)
        return vec_bytes + 2 * win
    if mode == "per_bucket":
        win = max((_group_size(per, nb, _STEP_CAP) * per
                   for per, nb in sizes), default=0)
        return vec_bytes + 2 * win
    total = sum(per * nb for per, nb in sizes) or 1
    budget = _VMEM_BUDGET * 2 // 5
    blk_bytes = 0
    for per, nb in sizes:
        share = max(_STEP_FLOOR, min(_STEP_CAP,
                                     budget * per * nb // total))
        blk_bytes += _group_size(per, nb, share) * per
    return vec_bytes + 2 * blk_bytes


def pallas_supported(data, L: int, k: int, x_dtype) -> bool:
    """True if the Pallas path can run this product (real dtype, VMEM fit)."""
    dtypes = ([d[0].dtype for d in data["dense"]]
              + [u.dtype for u, *_ in data["lr"]] + [jnp.dtype(x_dtype)])
    if any(jnp.issubdtype(dt, jnp.complexfloating) for dt in dtypes):
        return False
    if any(dt == jnp.float64 for dt in dtypes):
        return False  # f64 is emulated on TPU; XLA path handles parity runs
    itemsize = jnp.dtype(x_dtype).itemsize
    vec_bytes = 2 * k * max(L, 128) * itemsize
    sizes = _bucket_sizes(data, itemsize)
    return _vmem_model_bytes(sizes, vec_bytes) < _VMEM_BUDGET


def _term_fwd(kind, mats, xg, dtype):
    """Batched forward block application for one grid step.

    xg (G, k, ps) -> (G, k, pt): dense y = D x; low-rank y = U (V x).
    k < _MXU_MIN_K uses the VPU broadcast-multiply-reduce (full-width
    vector ops over the whole step's blocks — per-block (1, w) slivers
    waste 7/8 of the sublanes, measured as the dominant kernel cost in
    r04 attribution); larger k uses batched MXU dots."""
    k = xg.shape[1]
    if kind == "dense":
        D = mats[0]  # (G, pt, ps)
        if k >= _MXU_MIN_K:
            return jax.lax.dot_general(
                xg, D, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(dtype)
        # slices only: int/None mixed indexing lowers to an (unsupported)
        # multi-dim gather in Mosaic
        cols = [jnp.sum(D * xg[:, kk:kk + 1, :], axis=-1)
                for kk in range(k)]
        return jnp.stack(cols, axis=1).astype(dtype)  # (G, k, pt)
    U, V = mats  # (G, r, pt), (G, r, ps)
    if k >= _MXU_MIN_K:
        w = jax.lax.dot_general(xg, V, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            w, U, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype)
    cols = []
    for kk in range(k):
        w = jnp.sum(V * xg[:, kk:kk + 1, :], axis=-1)  # (G, r)
        cols.append(jnp.sum(U * w[:, :, None], axis=1))  # (G, pt)
    return jnp.stack(cols, axis=1).astype(dtype)


def _term_tr(kind, mats, xt, dtype):
    """Batched transposed block application: xt (G, k, pt) -> (G, k, ps)
    (real dtypes: 'T' == 'C')."""
    k = xt.shape[1]
    if kind == "dense":
        D = mats[0]
        if k >= _MXU_MIN_K:
            return jax.lax.dot_general(
                xt, D, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(dtype)
        cols = [jnp.sum(D * jnp.swapaxes(xt[:, kk:kk + 1, :], 1, 2), axis=1)
                for kk in range(k)]
        return jnp.stack(cols, axis=1).astype(dtype)
    U, V = mats  # (G, r, pt), (G, r, ps)
    if k >= _MXU_MIN_K:
        w = jax.lax.dot_general(xt, U, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            w, V, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype)
    cols = []
    for kk in range(k):
        w = jnp.sum(U * xt[:, kk:kk + 1, :], axis=-1)  # (G, r)
        cols.append(jnp.sum(V * w[:, :, None], axis=1))  # (G, ps)
    return jnp.stack(cols, axis=1).astype(dtype)


def _cterm_fwd(kind, mats, xg, dtype, csign):
    """Batched complex forward application over plane pairs for one grid
    step: xg (G, 2k, ps) stacked [Re | Im] columns -> (G, 2k, pt).

    csign = -1 conjugates the operator (negates the imaginary planes) —
    static, so the sign folds into the multiply.  All contractions are
    VPU broadcast-multiply-reduce: complex arithmetic is 2x MACs/byte,
    still far under the HBM DMA floor for small k."""
    k = xg.shape[1] // 2
    if kind == "cdense":
        Dr = mats[0]
        Di = mats[1] if csign > 0 else -mats[1]
        res, ims = [], []
        for kk in range(k):
            xr = xg[:, kk:kk + 1, :]
            xi = xg[:, k + kk:k + kk + 1, :]
            res.append(jnp.sum(Dr * xr - Di * xi, axis=-1))
            ims.append(jnp.sum(Dr * xi + Di * xr, axis=-1))
        return jnp.stack(res + ims, axis=1).astype(dtype)
    Ur = mats[0]  # (G, r, pt)
    Ui = mats[1] if csign > 0 else -mats[1]
    Vr = mats[2]  # (G, r, ps)
    Vi = mats[3] if csign > 0 else -mats[3]
    res, ims = [], []
    for kk in range(k):
        xr = xg[:, kk:kk + 1, :]
        xi = xg[:, k + kk:k + kk + 1, :]
        w_re = jnp.sum(Vr * xr - Vi * xi, axis=-1)  # (G, r)
        w_im = jnp.sum(Vr * xi + Vi * xr, axis=-1)
        res.append(jnp.sum(Ur * w_re[:, :, None] - Ui * w_im[:, :, None],
                           axis=1))
        ims.append(jnp.sum(Ur * w_im[:, :, None] + Ui * w_re[:, :, None],
                           axis=1))
    return jnp.stack(res + ims, axis=1).astype(dtype)


def _cterm_tr(kind, mats, xt, dtype, csign):
    """Batched complex transposed application: xt (G, 2k, pt) -> (G, 2k,
    ps).  With csign = -1 this is the conjugate transpose."""
    k = xt.shape[1] // 2
    if kind == "cdense":
        Dr = mats[0]
        Di = mats[1] if csign > 0 else -mats[1]
        res, ims = [], []
        for kk in range(k):
            xr = jnp.swapaxes(xt[:, kk:kk + 1, :], 1, 2)  # (G, pt, 1)
            xi = jnp.swapaxes(xt[:, k + kk:k + kk + 1, :], 1, 2)
            res.append(jnp.sum(Dr * xr - Di * xi, axis=1))  # (G, ps)
            ims.append(jnp.sum(Dr * xi + Di * xr, axis=1))
        return jnp.stack(res + ims, axis=1).astype(dtype)
    Ur = mats[0]  # (G, r, pt)
    Ui = mats[1] if csign > 0 else -mats[1]
    Vr = mats[2]  # (G, r, ps)
    Vi = mats[3] if csign > 0 else -mats[3]
    res, ims = [], []
    for kk in range(k):
        xr = xt[:, kk:kk + 1, :]
        xi = xt[:, k + kk:k + kk + 1, :]
        w_re = jnp.sum(Ur * xr - Ui * xi, axis=-1)  # (G, r)
        w_im = jnp.sum(Ur * xi + Ui * xr, axis=-1)
        res.append(jnp.sum(Vr * w_re[:, :, None] - Vi * w_im[:, :, None],
                           axis=1))
        ims.append(jnp.sum(Vr * w_im[:, :, None] + Vi * w_re[:, :, None],
                           axis=1))
    return jnp.stack(res + ims, axis=1).astype(dtype)


_N_BLOCKS = {"dense": 1, "lr": 2, "alr": 2, "cdense": 2, "clr": 4}


def _step_body(kind, G, dims, blocks, bases, merged, swapped, sym, csign,
               j0, meta_ref, x_ref, y_ref, g_proc=None, csign_mirror=1.0):
    """One bucket's per-step work on g_proc (<= G) blocks starting at flat
    index j0: gather -> batched block term -> scatter-accumulate (+ mirror
    term for symmetric storage).  `blocks` are the step's VMEM refs.
    Shared by the outer-grid fused kernel and the sequential emit_pipeline
    kernel.  g_proc < G happens only on a bucket's RAGGED TAIL step (nb
    not a G multiple): the window's trailing rows hold stale/garbage data
    and are simply not touched — this is what lets the launch pass bucket
    arrays to the pipeline UNPADDED (an in-jit jnp.pad re-copied the
    whole bucket on every product: the r04 kernel's hidden 3x HBM traffic
    on every real plan, tools/profile_matvec9g_result.json)."""
    if g_proc is None:
        g_proc = G
    bt, bs, bm = bases
    dtype = y_ref.dtype
    pt = dims[0]
    ps = dims[-1]
    r = dims[1] if len(dims) == 3 else 0
    cplx = kind in ("cdense", "clr")
    load = _load_al if kind == "alr" else _load_seg
    accum = _accum_al if kind == "alr" else _accum_seg
    # re-split fused buffers with static second-axis slices
    if kind in ("dense",):
        mats = (blocks[0][...],)
    elif kind == "cdense":
        M = blocks[0][...]
        mats = (M[:, :pt], M[:, pt:]) if merged \
            else (blocks[0][...], blocks[1][...])
    elif kind in ("lr", "alr"):
        if merged:
            M = blocks[0][...]
            mats = (M[:, :r], M[:, r:])
        else:
            mats = (blocks[0][...], blocks[1][...])
    else:  # clr
        if merged:
            M = blocks[0][...]
            mats = (M[:, :r], M[:, r:2 * r], M[:, 2 * r:3 * r],
                    M[:, 3 * r:])
        else:
            MU = blocks[0][...]
            MV = blocks[1][...]
            mats = (MU[:, :r], MU[:, r:], MV[:, :r], MV[:, r:])
    if g_proc != mats[0].shape[0]:
        mats = tuple(m[:g_proc] for m in mats)
    # main term: apply B ('N') / B^T (swapped); mirror term (only
    # for symmetric storage) applies the opposite direction at the
    # reflected offsets, masked per block by `mir`
    in_b, in_w = (bs, ps) if not swapped else (bt, pt)
    out_b, out_w = (bt, pt) if not swapped else (bs, ps)
    xg = jnp.stack([load(x_ref, meta_ref[in_b + j0 + g], in_w)
                    for g in range(g_proc)])  # (g_proc, k, in_w)
    if _PROF_SKIP_TERM:
        # stand-in keeping the gathers and the block DMA alive
        # (valid for square buckets: in_w == out_w): one reduce per
        # data tile, scalar-scaled pass-through of the gathers
        tot = sum(jnp.sum(m) for m in mats)
        out = (xg * (tot * 1e-30).astype(dtype))[:, :, :out_w]
    elif cplx:
        term = _cterm_fwd if not swapped else _cterm_tr
        out = term(kind, mats, xg, dtype, csign)
    else:
        term = _term_fwd if not swapped else _term_tr
        out = term(kind, mats, xg, dtype)  # (G, k, out_w)
    k = xg.shape[1]
    for g in range(g_proc):
        accum(y_ref, meta_ref[out_b + j0 + g], out_w,
              out[g:g + 1].reshape(k, out_w))
    if sym:
        xm = jnp.stack([load(x_ref, meta_ref[out_b + j0 + g], out_w)
                        for g in range(g_proc)])
        if cplx:
            # hermitian ('H') storage mirrors with the CONJUGATE
            # transpose: csign_mirror = -csign negates the imaginary
            # planes of the opposite-direction term ('S' keeps +csign)
            mterm = _cterm_tr if not swapped else _cterm_fwd
            outm = mterm(kind, mats, xm, dtype, csign_mirror)
        else:
            mterm = _term_tr if not swapped else _term_fwd
            outm = mterm(kind, mats, xm, dtype)  # (g_proc, k, in_w)
        for g in range(g_proc):
            accum(y_ref, meta_ref[in_b + j0 + g], in_w,
                  outm[g:g + 1].reshape(k, in_w)
                  * meta_ref[bm + j0 + g].astype(dtype))


def _fused_kernel(bucket_meta, resident, *refs):
    """One grid step of the FUSED product: every bucket owns a contiguous
    range of grid steps; outside its range a bucket's index map freezes
    (same block index -> the pipeline skips the DMA), so each step streams
    only the active bucket's blocks.  Fusing all buckets into one
    pallas_call removes the per-launch dispatch + output-combine cost of
    ~25 separate kernels (measured ~1 ms of a 2.7 ms N=40000 matvec).

    `resident=True` (the TPU path) keeps the x/y vectors in VMEM SCRATCH:
    x is DMA'd HBM->VMEM once at step 0 and y written back once at the
    last step.  Passing them as constant-index-map blocks instead makes
    the pipeline move them between HBM and VMEM every grid step — ~1 GB of
    hidden traffic per N=40000 product, measured as the dominant cost
    (tools/profile_matvec3/4.py).  The interpreter path keeps them as
    ordinary blocks (the generic interpreter has no DMA semantics).

    Within a step only the gather/scatter rotates are per-block (they need
    per-block dynamic lane offsets); the block math runs ONCE, batched
    over all G blocks of the step."""
    meta_ref = refs[0]  # ONE packed int32 scalar array for every bucket
    rest = refs[1:]
    i = pl.program_id(0)
    if resident:
        x_hbm, y_hbm, x_ref, y_ref, sem_in, sem_out = rest[-6:]
        rest = rest[:-6]

        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(x_hbm, x_ref, sem_in)
            cp.start()
            cp.wait()
            y_ref[:] = jnp.zeros_like(y_ref)
    else:
        x_ref, y_ref = rest[-2], rest[-1]
        rest = rest[:-2]

        @pl.when(i == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

    blk_pos = 0
    for b, (kind, start, steps, G, g_proc, j0_base, dims, swapped, sym,
            csign, csmir, merged, bases, own_blocks) in enumerate(
            bucket_meta):
        nblk = 1 if merged else (2 if kind == "clr" else _N_BLOCKS[kind])
        if own_blocks:
            blocks = rest[blk_pos:blk_pos + nblk]
            blk_pos += nblk
        # a ragged-tail entry (own_blocks False) reuses the main segment's
        # buffer refs: same pipelined window, fewer processed blocks

        @pl.when((i >= start) & (i < start + steps))
        def _(kind=kind, start=start, G=G, g_proc=g_proc, j0_base=j0_base,
              dims=dims, blocks=blocks, bases=bases, merged=merged,
              swapped=swapped, sym=sym, csign=csign, csmir=csmir, i=i):
            _step_body(kind, G, dims, blocks, bases, merged, swapped, sym,
                       csign, j0_base + (i - start) * G, meta_ref, x_ref,
                       y_ref, g_proc=g_proc, csign_mirror=csmir)

    if resident:
        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            cp = pltpu.make_async_copy(y_ref, y_hbm, sem_out)
            cp.start()
            cp.wait()


def _kernel_mode(interpret: bool) -> str:
    """Kernel structure selection (config.matvec_kernel_mode): interpret
    mode always runs the fused kernel (the generic interpreter has no DMA
    semantics for the manual x/y copies in 'seq')."""
    from ..config import get_config

    if interpret:
        return "fused"
    return get_config().matvec_kernel_mode


def _launch_per_bucket(entries, xT, swapped, symmetric, csign, interpret,
                       csign_mirror=1.0):
    """One pallas_call per bucket, partial (k, L) outputs summed by XLA:
    every launch's double-buffered window gets the whole VMEM budget (no
    cross-bucket split), at the price of one kernel dispatch + an x/y
    vector round-trip per bucket (~1 MB each, negligible next to the
    block stream)."""
    out = None
    for e in entries:
        y = _launch_fused([e], xT, swapped, symmetric, csign, interpret,
                          csign_mirror=csign_mirror)
        out = y if out is None else out + y
    return out


@partial(jax.jit, static_argnames=("ny_pad", "trans", "sym", "interpret"))
def apply_hmatrix_pallas(data, x_pad, ny_pad: int, trans: str, sym: str,
                         interpret: bool = False):
    """Same contract as ops.matvec.apply_hmatrix_padded, Pallas execution:
    ONE fused kernel launch covering every bucket.

    x_pad: (L, k) padded input (zeros in the pad region), L == ny_pad.
    Returns y_pad (L, k).
    """
    swapped = trans != "N"
    symmetric = sym != "N"
    if isinstance(data, dict) and "aligned" in data:
        inner, lr_kind = data["aligned"], "alr"
    else:
        inner, lr_kind = data, "lr"
    entries = ([("dense", (D,), t, s, m)
                for D, t, s, m in inner["dense"]]
               + [(lr_kind, (U, V), t, s, m)
                  for U, V, t, s, m in inner["lr"]])
    if not entries:
        return x_pad * 0
    xT = jnp.swapaxes(x_pad, 0, 1)  # (k, L): minor dim dense across lanes
    mode = _kernel_mode(interpret)
    if mode == "seq":
        yT = _launch_seq(entries, xT, swapped, symmetric, 1.0)
    elif mode == "per_bucket":
        yT = _launch_per_bucket(entries, xT, swapped, symmetric, 1.0,
                                interpret)
    else:
        yT = _launch_fused(entries, xT, swapped, symmetric, 1.0, interpret)
    return jnp.swapaxes(yT, 0, 1)


@partial(jax.jit, static_argnames=("ny_pad", "trans", "sym", "interpret"))
def apply_hmatrix_pallas_complex(cdata, x_pad, ny_pad: int, trans: str,
                                 sym: str = "N",
                                 interpret: bool = False):
    """complex64 product through the plane-split fused kernel
    (ops/matvec.py split_planes layout; unsymmetric storage only).

    x_pad: (L, k) complex padded input.  The kernel streams each block's
    re/im f32 plane pair once (same bytes as the complex original) and
    forms the complex product with explicit cross terms on the stacked
    real RHS [Re(x) | Im(x)]; 'C' conjugates by negating the imaginary
    planes (static csign)."""
    k = x_pad.shape[1]
    entries = ([("cdense", (Dr, Di), t, s, m)
                for Dr, Di, t, s, m in cdata["dense"]]
               + [("clr", (Ur, Ui, Vr, Vi), t, s, m)
                  for Ur, Ui, Vr, Vi, t, s, m in cdata["lr"]])
    if not entries:
        return x_pad * 0
    x2 = jnp.concatenate([jnp.real(x_pad), jnp.imag(x_pad)],
                         axis=1).astype(jnp.float32)
    xT = jnp.swapaxes(x2, 0, 1)  # (2k, L)
    csign = -1.0 if trans == "C" else 1.0
    # mirror conjugation parity with the XLA path (ops/matvec.py):
    # conj_mirror = (sym == 'H') != (trans == 'C')
    csign_m = -1.0 if ((sym == "H") != (trans == "C")) else 1.0
    symmetric = sym != "N"
    mode = _kernel_mode(interpret)
    if mode == "seq" and not symmetric:
        yT = _launch_seq(entries, xT, trans != "N", False, csign)
    elif mode == "per_bucket":
        yT = _launch_per_bucket(entries, xT, trans != "N", symmetric,
                                csign, interpret, csign_mirror=csign_m)
    else:
        yT = _launch_fused(entries, xT, trans != "N", symmetric, csign,
                           interpret, csign_mirror=csign_m)
    y2 = jnp.swapaxes(yT, 0, 1)  # (L, 2k)
    return (y2[:, :k] + 1j * y2[:, k:]).astype(x_pad.dtype)


def _pad_bucket(blocks, t_off, s_off, mir, G):
    """Pad a bucket's arrays so nb is a multiple of the group size G
    (padding blocks are zero data at offset 0 — they add nothing)."""
    nb = t_off.shape[0]
    nb_pad = -(-nb // G) * G
    if nb_pad != nb:
        p = nb_pad - nb
        blocks = tuple(jnp.pad(b, ((0, p),) + ((0, 0),) * (b.ndim - 1))
                       for b in blocks)
        t_off = jnp.pad(t_off, (0, p))
        s_off = jnp.pad(s_off, (0, p))
        mir = jnp.pad(mir, (0, p))
    return blocks, t_off, s_off, mir, nb_pad


def _merge_bucket(kind, blocks):
    """Fuse a bucket's factor arrays into fewer buffers when the minor
    widths match (dense/cdense second axes always do; lr needs pt == ps);
    rectangular clr fuses the re/im plane pairs.  Returns (blocks, merged)."""
    if len(blocks) > 1 and all(b.shape[2] == blocks[0].shape[2]
                               for b in blocks):
        return (jnp.concatenate(blocks, axis=1),), True
    if kind == "clr":
        return (jnp.concatenate(blocks[0:2], axis=1),
                jnp.concatenate(blocks[2:4], axis=1)), False
    return blocks, False


# Sequential-pipeline kernel tuning: per-bucket inner pipelines run one
# at a time, so each window can take the whole VMEM block budget.  Large
# steps amortize the ~1 us/step pipeline cost; the group cap bounds the
# unrolled per-block gather/accumulate code (compile size) — per-block
# vector ops hide under the DMA once steps are MBs (measured: a uniform
# single-bucket r16 640-wide product runs at 718 GB/s vs the 768 GB/s
# stream floor, tools/profile_matvec5_result.json).
_SEQ_STEP_BYTES = int(_os_env.environ.get("HTOOL_SEQ_STEP_BYTES", 4 << 20))
_SEQ_MAX_GROUP = int(_os_env.environ.get("HTOOL_SEQ_MAX_GROUP", 96))


def _launch_seq(entries, xT, swapped, symmetric, csign):
    """Sequential per-bucket pipelines inside ONE pallas_call: x/y live in
    VMEM scratch for the whole launch; each bucket streams its blocks
    through its own double-buffered emit_pipeline window (scoped VMEM).

    This replaces the outer-grid fused kernel on TPU: with B buckets that
    kernel keeps ~B live pipelined buffers and splits the VMEM budget
    across them — the per-step bookkeeping of all those buffers (the
    buffer-count degradation measured in tools/profile_matvec3.py) plus
    the VMEM-divided step sizes cost ~3x the DMA floor on realistic
    15-bucket plans.  Here exactly ONE window is active at a time, so
    steps are ~4 MB and bookkeeping is one buffer's."""
    k, L = xT.shape
    bucket_meta = []   # (kind, steps, G, dims, merged, bases, nblk)
    scalar_parts = []
    scalar_len = 0
    block_args = []
    specs_all = []     # per-bucket list of inner BlockSpecs
    def pad128(b):
        """emit_pipeline DMA-slices the HBM memref directly, so the block
        lane extent must be a 128 multiple and the sublane extent an 8
        multiple (the outer-grid pipeline pads these internally); zero
        padding keeps the product exact — padded factor columns multiply
        into padded x lanes as zeros."""
        r8 = -(-b.shape[1] // 8) * 8
        w128 = -(-b.shape[2] // 128) * 128
        if (r8, w128) != b.shape[1:]:
            b = jnp.pad(b, ((0, 0), (0, r8 - b.shape[1]),
                            (0, w128 - b.shape[2])))
        return b

    for kind, blocks, t_off, s_off, mir in entries:
        blocks = tuple(pad128(b) for b in blocks)
        if kind in ("dense", "cdense"):
            nb, pt, ps = blocks[0].shape
            dims = (pt, ps)
        else:
            nb, r, pt = blocks[0].shape
            ps = blocks[-1].shape[2]
            dims = (pt, r, ps)
        per = sum(int(np.prod(b.shape[1:])) * b.dtype.itemsize
                  for b in blocks)
        G = int(min(_SEQ_MAX_GROUP, max(1, _SEQ_STEP_BYTES // per), nb))
        blocks, t_off, s_off, mir, nb_pad = _pad_bucket(
            blocks, jnp.asarray(t_off, jnp.int32),
            jnp.asarray(s_off, jnp.int32), jnp.asarray(mir, jnp.int32), G)
        steps = nb_pad // G
        blocks, merged = _merge_bucket(kind, blocks)
        bases = (scalar_len, scalar_len + nb_pad, scalar_len + 2 * nb_pad)
        scalar_parts.extend([t_off, s_off, mir])
        scalar_len += 3 * nb_pad
        bucket_meta.append((kind, steps, G, dims, merged, bases,
                            len(blocks)))
        specs_all.append([
            pl.BlockSpec((G,) + tuple(b.shape[1:]),
                         lambda i, nd=b.ndim: (i,) + (0,) * (nd - 1))
            for b in blocks])
        block_args.extend(blocks)
    meta = jnp.concatenate(scalar_parts)
    nargs = len(block_args)

    def kernel(meta_ref, *refs):
        bucket_refs = refs[:nargs]
        x_hbm = refs[nargs]
        y_hbm = refs[nargs + 1]
        x_ref, y_ref, sem_in, sem_out = refs[nargs + 2:]
        cp = pltpu.make_async_copy(x_hbm, x_ref, sem_in)
        cp.start()
        cp.wait()
        y_ref[:] = jnp.zeros_like(y_ref)
        pos = 0
        for (kind, steps, G, dims, merged, bases, nblk), specs in zip(
                bucket_meta, specs_all):
            bufs = bucket_refs[pos:pos + nblk]
            pos += nblk

            def body(*blk_refs, kind=kind, G=G, dims=dims, merged=merged,
                     bases=bases):
                j0 = pl.program_id(0) * G  # inner grid index (grid_env)
                _step_body(kind, G, dims, blk_refs, bases, merged,
                           swapped, symmetric, csign, j0, meta_ref,
                           x_ref, y_ref)

            pltpu.emit_pipeline(body, grid=(steps,), in_specs=specs)(*bufs)
        cp2 = pltpu.make_async_copy(y_ref, y_hbm, sem_out)
        cp2.start()
        cp2.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (nargs + 1),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((k, L), xT.dtype),
                        pltpu.VMEM((k, L), xT.dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, L), xT.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=114 * 1024 * 1024),
    )(meta, *block_args, xT)


def _launch_fused(entries, xT, swapped, symmetric, csign, interpret,
                  csign_mirror=1.0):
    """Shared plumbing of the fused single-launch product: bucket windows,
    frozen index maps, scalar prefetch, one pallas_call.  xT is the
    transposed (k, L) real input; returns yT (k, L).

    Pipeline-managed argument COUNT is the hidden per-step cost (the
    stream microbenchmark in tools/profile_matvec3.py degrades with buffer
    count, not bytes): every bucket's offset triples are packed into ONE
    scalar-prefetch array, and each bucket's factor arrays are fused into
    a single buffer along the second axis whenever widths allow (square
    low-rank buckets: U|V stacked on the rank axis; complex planes
    likewise) — the kernel re-splits with static sublane slices."""
    k, L = xT.shape
    bucket_meta = []   # (kind, start, steps, G, dims, swapped, sym, csign,
    #                     merged, (bt, bs, bm) scalar bases)
    scalar_parts = []  # flat int32 pieces, one offset array at a time
    scalar_len = 0
    block_args = []    # per-bucket block arrays (padded, possibly fused)
    in_specs = []
    start = 0

    step_budget = _weighted_step_budgets(entries)
    for bidx, (kind, blocks, t_off, s_off, mir) in enumerate(entries):
        if kind in ("dense", "cdense"):
            nb, pt, ps = blocks[0].shape
            dims = (pt, ps)
        else:
            nb, r, pt = blocks[0].shape
            ps = blocks[-1].shape[2]
            dims = (pt, r, ps)
        per = sum(int(np.prod(b.shape[1:])) * b.dtype.itemsize
                  for b in blocks)
        G = _group_size(per, nb, step_budget[bidx])
        t_off = jnp.asarray(t_off, jnp.int32)
        s_off = jnp.asarray(s_off, jnp.int32)
        mir = jnp.asarray(mir, jnp.int32)
        # RAGGED split: steps_full G-sized steps + one tail step of the
        # remaining nb % G blocks, reading the bucket arrays UNPADDED.
        # Padding nb to a G multiple with jnp.pad instead would re-COPY
        # the whole bucket inside every product jit — the r04 kernel's
        # dominant hidden cost (~3x HBM traffic; real plans never have
        # G-multiple buckets, tools/profile_matvec9g_result.json).  The
        # tail window's trailing rows are stale garbage the kernel never
        # reads (g_proc bounds every per-block loop).
        steps_full = nb // G
        tail = nb % G
        steps = steps_full + (1 if tail else 0)
        merged = False
        if len(blocks) > 1 and all(b.shape[2] == blocks[0].shape[2]
                                   for b in blocks):
            blocks = (jnp.concatenate(blocks, axis=1),)
            merged = True
        elif kind == "clr":
            # rectangular complex low-rank: fuse the re/im plane pairs
            blocks = (jnp.concatenate(blocks[0:2], axis=1),
                      jnp.concatenate(blocks[2:4], axis=1))
        bases = (scalar_len, scalar_len + nb, scalar_len + 2 * nb)
        scalar_parts.extend([t_off, s_off, mir])
        scalar_len += 3 * nb
        if steps_full:
            bucket_meta.append((kind, start, steps_full, G, G, 0, dims,
                                swapped, symmetric, csign, csign_mirror,
                                merged, bases, True))
        if tail:
            bucket_meta.append((kind, start + steps_full, 1, G, tail,
                                steps_full * G, dims, swapped, symmetric,
                                csign, csign_mirror, merged, bases,
                                not steps_full))
        for b in blocks:
            # frozen index map: constant block index outside this bucket's
            # grid range -> the pipeline does not re-DMA it
            def imap(i, *_, start=start, steps=steps, nd=b.ndim):
                j = jnp.clip(i - start, 0, steps - 1)
                return (j,) + (0,) * (nd - 1)
            in_specs.append(
                pl.BlockSpec((G,) + tuple(b.shape[1:]), imap))
            block_args.append(b)
        start += steps
    scalar_args = [jnp.concatenate(scalar_parts)]

    resident = not interpret
    if resident:
        # x/y live in VMEM scratch for the whole launch (one DMA in, one
        # out); the HBM refs pass through untouched by the pipeline
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        out_specs = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = [pltpu.VMEM((k, L), xT.dtype),
                   pltpu.VMEM((k, L), xT.dtype),
                   pltpu.SemaphoreType.DMA,
                   pltpu.SemaphoreType.DMA]
    else:
        in_specs.append(pl.BlockSpec((k, L), lambda i, *_: (0, 0)))
        out_specs = pl.BlockSpec((k, L), lambda i, *_: (0, 0))
        scratch = []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(start,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        partial(_fused_kernel, bucket_meta, resident),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, L), xT.dtype),
        # every bucket's double-buffered step window lives in VMEM at once;
        # Mosaic's default 16 MB scoped-vmem limit rejects realistic plans
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=114 * 1024 * 1024),
        interpret=interpret,
    )(*scalar_args, *block_args, xT)
