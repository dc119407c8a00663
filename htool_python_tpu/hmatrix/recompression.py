"""Post-assembly rank re-truncation.

Reference parity: module-level `recompression(hmatrix[, callback])` and
`openmp_recompression(hmatrix[, callback])`
(src/htool/hmatrix/hmatrix.hpp:96-99).
Note the reference quirk: the no-callback `openmp_recompression` binding
calls the serial recompression (hmatrix.hpp:99); here both names run the
same batched device kernel (which is already parallel on TPU).
Mutates the HMatrix in place, like the reference.

The optional `callback(U, V, epsilon) -> (U2, V2) | None` is the custom
per-leaf recompression hook: it receives one leaf's factors in the
user-facing layout (U (pt, r), V (r, ps), numpy) and returns replacement
factors, or None to keep the leaf unchanged.  The callback path runs on
host leaf-by-leaf (a parity surface, not the hot path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.complex_io import to_host


def _recompress_with_callback(hmatrix, eps: float, callback) -> None:
    lr_arrays, lr_ranks = [], []
    for (Ut, V, *_), b, ranks in zip(hmatrix._assembly_data()["lr"],
                                     hmatrix.plan.lowrank_buckets,
                                     hmatrix._lr_ranks):
        Uh = to_host(Ut).transpose(0, 2, 1)  # (nb, pt, r)
        Vh = to_host(V)                      # (nb, r, ps)
        new_U, new_V, new_r = [], [], []
        for i in range(Uh.shape[0]):
            r = int(ranks[i])
            res = callback(Uh[i, :b.t_sz[i], :r].copy(),
                           Vh[i, :r, :b.s_sz[i]].copy(), eps)
            if res is None:
                new_U.append(Uh[i, :, :])
                new_V.append(Vh[i, :, :])
                new_r.append(r)
                continue
            U2, V2 = (np.asarray(a, dtype=hmatrix.dtype) for a in res)
            if (U2.shape[0] != b.t_sz[i] or V2.shape[1] != b.s_sz[i]
                    or U2.shape[1] != V2.shape[0]):
                raise ValueError(
                    "recompression callback returned factors of shape "
                    f"{U2.shape} x {V2.shape} for a {b.t_sz[i]}x{b.s_sz[i]} "
                    "leaf")
            r2 = U2.shape[1]
            Up = np.zeros((Uh.shape[1], Uh.shape[2]), dtype=hmatrix.dtype)
            Vp = np.zeros((Vh.shape[1], Vh.shape[2]), dtype=hmatrix.dtype)
            Up[:U2.shape[0], :r2] = U2
            Vp[:r2, :V2.shape[1]] = V2
            new_U.append(Up)
            new_V.append(Vp)
            new_r.append(r2)
        r_arr = np.asarray(new_r, dtype=np.int32)
        rmax = max(int(r_arr.max()) if len(r_arr) else 1, 1)
        U3 = np.stack(new_U)[:, :, :rmax]
        V3 = np.stack(new_V)[:, :rmax, :]
        lr_arrays.append((U3, V3))
        lr_ranks.append(r_arr)
    hmatrix._set_lr_arrays(lr_arrays, lr_ranks)


def recompression(hmatrix, epsilon: float | None = None,
                  callback=None) -> None:
    if isinstance(hmatrix, (list, tuple)):  # PerPartition container
        for h in hmatrix:
            recompression(h, epsilon, callback)
        return
    eps = float(epsilon) if epsilon is not None else hmatrix.epsilon
    if callback is not None:
        _recompress_with_callback(hmatrix, eps, callback)
        hmatrix._lr_svd_form = False  # user factors: form unknown
        return
    if getattr(hmatrix, "_lr_svd_form", False):
        _recompress_svd_form(hmatrix, eps)
        return
    _recompress_streaming(hmatrix, eps)


@jax.jit
def _svd_form_ranks_jit(Ut, eps):
    """Post-truncation ranks for SVD-form factors: row i of rank-major Ut
    is sigma_i * u_i, so the row norms ARE the block's singular values
    (descending; pad rows are zero).  One cheap read of U per bucket."""
    s2 = jnp.sum(jnp.abs(Ut) ** 2, axis=2)  # (nb, r) real
    total = jnp.sum(s2, axis=1, keepdims=True)
    tail = jnp.cumsum(s2[:, ::-1], axis=1)[:, ::-1]
    keep = tail > (eps * eps) * jnp.maximum(total,
                                            jnp.finfo(s2.dtype).tiny)
    return jnp.sum(keep, axis=1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("widths",))
def _trim_classes_jit(widths, Ut, V, class_sels, r_new):
    """Gather each rank class's blocks and trim to the class width — a
    LEADING-axis slice in the rank-major storage layout, no transpose.
    Rows in [new_rank, width) carried live (now-truncated) components, so
    they are masked to zero (the product kernels stream padded widths and
    rely on zero padding, ops/matvec.py)."""
    outs = []
    for w, sel in zip(widths, class_sels):
        # stored arrays can be NARROWER than their rank class (host-path
        # assembly packs at the bucket's actual rmax): clamp like the
        # product kernels do
        we = min(w, Ut.shape[1])
        rk = r_new[sel]
        mask = (jnp.arange(we)[None, :, None] < rk[:, None, None])
        outs.append((Ut[sel][:, :we, :] * mask.astype(Ut.dtype),
                     V[sel][:, :we, :] * mask.astype(V.dtype)))
    return outs


def _recompress_svd_form(hmatrix, eps: float) -> None:
    """O(stored bytes) recompression for SVD-form factors.

    Every default assembly path ends in the batched QR+SVD truncation
    (ops/aca.py _batched_truncate_jit, hmatrix/assembly.py _host_truncate),
    which leaves each leaf as an exact SVD triple: U = Q W diag(s) with
    orthonormal Q W, V with orthonormal rows.  Re-truncating such a pair
    at a new epsilon needs NO factorization — the singular values are the
    row norms of the stored rank-major Ut, the tail-energy criterion picks
    the new rank, and trimming is a leading-axis slice plus re-classing.
    This replaces the chunked QR+SVD pass (258 s at Helmholtz N=100k,
    BENCH r5 run1) with ~3 reads of the stored factors (sub-second device
    time).  Operators whose factors came from user hooks
    (`VirtualLowRankGenerator`, recompression callbacks) keep
    `_lr_svd_form = False` and take the general streaming path."""
    from ..ops.aca import truncate_eps_array
    from ..ops.matvec import RankMajorFactors
    from .assembly import _rank_classes, _subset_bucket

    data = hmatrix._assembly_data()
    eps_arr = truncate_eps_array(eps)
    # dispatch every bucket's rank computation before any readback: each
    # readback costs a tunnel RTT and the computations are independent
    rank_devs = [_svd_form_ranks_jit(Ut, eps_arr)
                 for (Ut, V, *_) in data["lr"]]
    new_buckets, new_arrays, new_ranks = [], [], []
    for bi, ((Ut, V, *_), b) in enumerate(
            zip(list(data["lr"]), hmatrix.plan.lowrank_buckets)):
        r_new = np.asarray(rank_devs[bi])
        class_list = list(_rank_classes(r_new))
        widths = tuple(rc for rc, _ in class_list)
        sels = tuple(jnp.asarray(sk.astype(np.int32))
                     for _, sk in class_list)
        outs = _trim_classes_jit(widths, Ut, V, sels,
                                 jnp.asarray(r_new.astype(np.int32)))
        for (rc, sk), (Ut_c, V_c) in zip(class_list, outs):
            new_buckets.append(_subset_bucket(b, sk))
            new_arrays.append(RankMajorFactors(Ut_c, V_c))
            new_ranks.append(r_new[sk].astype(np.int32))
        if new_arrays:
            jax.block_until_ready(new_arrays[-1][0])
        data["lr"][bi] = None  # bound peak memory to ~one bucket extra
    hmatrix._set_lr_structure(new_buckets, new_arrays, new_ranks)
    # trimmed SVD triples are still SVD triples
    hmatrix._lr_svd_form = True


def _recompress_streaming(hmatrix, eps: float) -> None:
    """Chunked, rank-reclassing recompression (round-5 rework).

    The r04 spelling ran ONE batched QR+SVD program over each whole
    bucket: at the Helmholtz N=70k scale the per-bucket complex
    workspaces made recompression cost 3x the assembly (BENCH_r04
    recompression_s 213.8 vs assembly_s 69.8) and its transients crowded
    the 16 GB chip.  This version streams each bucket through the same
    ladder-sized chunks assembly uses (bounded workspace, bounded compile
    set) and re-packs the results into FRESH rank classes via the fused
    assembly post-pass — recompressed ranks drop below their assembly
    class, so re-classing also trims the padded bytes the matvec
    streams."""
    from ..ops.aca import (_batched_truncate_jit, _chunk_cap,
                           _chunk_slices, truncate_eps_array)
    from .assembly import _pack_classes_jit, _rank_classes, _subset_bucket
    from ..ops.matvec import RankMajorFactors

    data = hmatrix._assembly_data()
    eps_arr = truncate_eps_array(eps)
    itemsize = np.dtype(hmatrix.dtype).itemsize
    new_buckets, new_arrays, new_ranks = [], [], []
    for bi, ((Ut, V, *_), b, ranks) in enumerate(
            zip(data["lr"], hmatrix.plan.lowrank_buckets,
                hmatrix._lr_ranks)):
        nb, r, pt = Ut.shape
        ps = V.shape[2]
        # QR/SVD workspace expands the operand ~8x; budget the chunk so
        # the transient stays bounded at Helmholtz scale
        cap = _chunk_cap((pt + ps) * r * 8, itemsize)
        chunks, rank_devs = [], []
        ranks = np.asarray(ranks)
        # NO per-chunk host syncs: the TPU sits behind a ~25 ms tunnel, so
        # a rank readback per chunk serializes the whole pass on RTTs
        # (BENCH r5b: 367 s recompression at Helmholtz N=85000, nearly all
        # latency).  Chunks stay untrimmed (full width r) and the loop
        # dispatches asynchronously; ONE readback of all ranks per bucket
        # follows, and _pack_classes_jit does the trimming.
        for i0, i1, size in _chunk_slices(nb, cap):
            Uc = jnp.swapaxes(Ut[i0:i1], 1, 2)  # (c, pt, r)
            Vc = V[i0:i1]
            rc0 = jnp.asarray(ranks[i0:i1], jnp.int32)
            if i1 - i0 != size:  # ladder pad (bounded compile set)
                p = size - (i1 - i0)
                Uc = jnp.pad(Uc, ((0, p), (0, 0), (0, 0)))
                Vc = jnp.pad(Vc, ((0, p), (0, 0), (0, 0)))
                rc0 = jnp.pad(rc0, (0, p))
            U2, V2, r2 = _batched_truncate_jit(-1, Uc, Vc, rc0, eps_arr)
            chunks.append((U2[:i1 - i0], V2[:i1 - i0]))
            rank_devs.append(r2[:i1 - i0])
        r_new = (np.asarray(jnp.concatenate(rank_devs))  # ONE readback
                 if rank_devs else ranks)
        class_list = list(_rank_classes(r_new))
        widths = tuple(rc for rc, _ in class_list)
        bounds = np.cumsum([0] + [c[0].shape[0] for c in chunks])
        class_sels = []
        for _, sk in class_list:
            class_sels.append([
                jnp.asarray((sk[(sk >= bounds[ci]) & (sk < bounds[ci + 1])]
                             - bounds[ci]).astype(np.int32))
                for ci in range(len(chunks))])
        outs = _pack_classes_jit(widths, [c[0] for c in chunks],
                                 [c[1] for c in chunks], class_sels)
        for (rc, sk), (Ut_c, V_c) in zip(class_list, outs):
            new_buckets.append(_subset_bucket(b, sk))
            new_arrays.append(RankMajorFactors(Ut_c, V_c))
            new_ranks.append(r_new[sk].astype(np.int32))
        if new_arrays:
            import jax
            jax.block_until_ready(new_arrays[-1][0])
        # free THIS bucket's old factors before moving on: without this
        # the whole old representation stays alive until the final swap
        # and peak HBM is ~2x the stored operator (fatal at Helmholtz
        # N=100k on the 16 GB chip)
        data["lr"][bi] = None
    hmatrix._set_lr_structure(new_buckets, new_arrays, new_ranks)
    # the batched truncation emits SVD triples: later recompressions of
    # this operator can take the O(stored bytes) fast path
    hmatrix._lr_svd_form = True


def openmp_recompression(hmatrix, epsilon: float | None = None,
                         callback=None) -> None:
    recompression(hmatrix, epsilon, callback)
