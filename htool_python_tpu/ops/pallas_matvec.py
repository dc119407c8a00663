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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for x + y + every bucket's double-buffered step blocks
# (v5e has 128 MB VMEM per core; leave headroom for Mosaic scratch)
_VMEM_BUDGET = 64 * 1024 * 1024


def _dot(a, b, dims, dtype):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32).astype(dtype)


# Contraction engine choice.  With few RHS columns (k < _MXU_MIN_K) each
# per-block dot is a (k, ps) x (ps, pt) sliver: the MXU pays its full
# pipeline latency (plus the multi-pass f32 emulation) for 1/128th of its
# throughput, and the serialized per-block dots — not HBM bandwidth —
# dominate the product (r03 measurement: halving stored bytes left the
# matvec time unchanged).  The VPU formulation below instead computes
# broadcast-multiply + axis-reduce, which streams the block data from VMEM
# at register rate with no MXU latency per block; for k = 1 the total VPU
# work is ~bytes/4KB cycles, far below the HBM DMA floor.  Large k keeps
# the MXU path (the dot amortizes across columns).
_MXU_MIN_K = 8


def _contract_right(A, x, dtype):
    """x (k, w_in) x A (w_out, w_in) -> (k, w_out), contracting w_in
    (= A @ x per column).  VPU multiply-reduce for small k."""
    k = x.shape[0]
    if k >= _MXU_MIN_K:
        return _dot(x, A, ((1,), (1,)), dtype)
    rows = [jnp.sum(A * x[kk][None, :], axis=-1) for kk in range(k)]
    return jnp.stack(rows).astype(dtype)


def _contract_left(A, x, dtype):
    """x (k, w_in) x A (w_in, w_out) -> (k, w_out), contracting w_in
    (= A^T @ x per column).  VPU multiply-reduce for small k."""
    k = x.shape[0]
    if k >= _MXU_MIN_K:
        return _dot(x, A, ((1,), (0,)), dtype)
    rows = [jnp.sum(A * x[kk][:, None], axis=0) for kk in range(k)]
    return jnp.stack(rows).astype(dtype)


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
    W = _win_width(width)
    base = pl.multiple_of((off // 128) * 128, 128)
    win = x_ref[:, pl.ds(base, W)]
    sh = off - base  # 0..127
    return pltpu.roll(win, W - sh, 1)[:, :width]


def _accum_seg(y_ref, off, width: int, acc):
    """y_ref[:, off:off+width] += acc with an arbitrary dynamic offset."""
    W = _win_width(width)
    base = pl.multiple_of((off // 128) * 128, 128)
    win = y_ref[:, pl.ds(base, W)]
    sh = off - base
    buf = jnp.pad(acc, ((0, 0), (0, W - acc.shape[1])))
    y_ref[:, pl.ds(base, W)] = win + pltpu.roll(buf, sh, 1)


# target bytes of block data per grid step: large enough to amortize the
# per-step pipeline overhead, small enough to double-buffer in VMEM
_STEP_BYTES = 1 << 18


def _group_size(per_block_bytes: int, nb: int) -> int:
    G = max(1, _STEP_BYTES // max(per_block_bytes, 1))
    return int(min(G, 256, nb))


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
    # the fused kernel holds EVERY bucket's current step block (double
    # buffered) in VMEM simultaneously
    blk_bytes = 0
    for d in data["dense"]:
        nb, pt, ps = d[0].shape
        per = pt * ps * itemsize
        blk_bytes += _group_size(per, nb) * per
    for u, v, *_ in data["lr"]:
        nb = u.shape[0]
        per = (u.shape[1] * u.shape[2] + v.shape[1] * v.shape[2]) * itemsize
        blk_bytes += _group_size(per, nb) * per
    return vec_bytes + 2 * blk_bytes < _VMEM_BUDGET


def _fused_kernel(bucket_meta, *refs):
    """One grid step of the FUSED product: every bucket owns a contiguous
    range of grid steps; outside its range a bucket's index map freezes
    (same block index -> the pipeline skips the DMA), so each step streams
    only the active bucket's blocks.  Fusing all buckets into one
    pallas_call removes the per-launch dispatch + output-combine cost of
    ~25 separate kernels (measured ~1 ms of a 2.7 ms N=40000 matvec)."""
    n_scalar = 3 * len(bucket_meta)
    scalars = refs[:n_scalar]
    rest = refs[n_scalar:]
    x_ref, y_ref = rest[-2], rest[-1]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    blk_pos = 0
    for b, (kind, start, steps, G, dims, swapped, sym) in \
            enumerate(bucket_meta):
        t_off, s_off, mir = scalars[3 * b:3 * b + 3]
        if kind == "dense":
            blocks = rest[blk_pos:blk_pos + 1]
            blk_pos += 1
        else:
            blocks = rest[blk_pos:blk_pos + 2]
            blk_pos += 2

        @pl.when((i >= start) & (i < start + steps))
        def _(kind=kind, start=start, G=G, dims=dims, blocks=blocks,
              t_off=t_off, s_off=s_off, mir=mir, swapped=swapped, sym=sym,
              i=i):
            j0 = (i - start) * G

            def body(j, carry):
                to, so = t_off[j0 + j], s_off[j0 + j]
                dtype = y_ref.dtype
                if kind == "dense":
                    pt, ps = dims
                    D = blocks[0][j]

                    def main():
                        xs = _load_seg(x_ref, so, ps)
                        _accum_seg(y_ref, to, pt,
                                   _contract_right(D, xs, dtype))

                    def mirror():
                        xt = _load_seg(x_ref, to, pt)
                        _accum_seg(y_ref, so, ps,
                                   _contract_left(D, xt, dtype))
                else:
                    pt, r, ps = dims
                    U = blocks[0][j]  # (r, pt)
                    V = blocks[1][j]  # (r, ps)

                    def main():
                        xs = _load_seg(x_ref, so, ps)
                        w = _contract_right(V, xs, dtype)
                        _accum_seg(y_ref, to, pt,
                                   _contract_left(U, w, dtype))

                    def mirror():
                        xt = _load_seg(x_ref, to, pt)
                        w = _contract_right(U, xt, dtype)
                        _accum_seg(y_ref, so, ps,
                                   _contract_left(V, w, dtype))

                if not swapped:
                    main()
                    if sym:
                        @pl.when(mir[j0 + j] != 0)
                        def _():
                            mirror()
                else:
                    mirror()
                    if sym:
                        @pl.when(mir[j0 + j] != 0)
                        def _():
                            main()
                return carry

            jax.lax.fori_loop(0, G, body, 0)


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
    xT = jnp.swapaxes(x_pad, 0, 1)  # (k, L): minor dim dense across lanes
    k, L = xT.shape

    bucket_meta = []   # (kind, start, steps, G, dims, swapped, sym)
    scalar_args = []   # t_off, s_off, mir per bucket (padded to G multiple)
    block_args = []    # D | U, V per bucket (padded)
    in_specs = []
    start = 0

    def pad_bucket(blocks, t_off, s_off, mir, G):
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

    entries = ([("dense", (D,), t, s, m)
                for D, t, s, m in data["dense"]]
               + [("lr", (U, V), t, s, m)
                  for U, V, t, s, m in data["lr"]])
    if not entries:
        return x_pad * 0

    for kind, blocks, t_off, s_off, mir in entries:
        if kind == "dense":
            nb, pt, ps = blocks[0].shape
            per = pt * ps * blocks[0].dtype.itemsize
            dims = (pt, ps)
        else:
            nb, r, pt = blocks[0].shape
            ps = blocks[1].shape[2]
            per = r * (pt + ps) * blocks[0].dtype.itemsize
            dims = (pt, r, ps)
        G = _group_size(per, nb)
        blocks, t_off, s_off, mir, nb_pad = pad_bucket(
            blocks, jnp.asarray(t_off, jnp.int32),
            jnp.asarray(s_off, jnp.int32), jnp.asarray(mir, jnp.int32), G)
        steps = nb_pad // G
        bucket_meta.append((kind, start, steps, G, dims, swapped, symmetric))
        scalar_args.extend([t_off, s_off, mir])
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

    in_specs.append(pl.BlockSpec((k, L), lambda i, *_: (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 * len(bucket_meta),
        grid=(start,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((k, L), lambda i, *_: (0, 0)),
    )
    yT = pl.pallas_call(
        partial(_fused_kernel, bucket_meta),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, L), xT.dtype),
        # every bucket's double-buffered step window lives in VMEM at once;
        # Mosaic's default 16 MB scoped-vmem limit rejects realistic plans
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*scalar_args, *block_args, xT)
    return jnp.swapaxes(yT, 0, 1)
