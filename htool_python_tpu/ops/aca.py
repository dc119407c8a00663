"""Batched partial-pivot Adaptive Cross Approximation (device path).

TPU-native equivalent of the reference core's default low-rank compressor
(partial ACA [unverified default, SURVEY.md §2.2]; accuracy contract pinned
by tests/test_hmatrix.py:83).  One bucket of equally-padded admissible
blocks is compressed by a single `lax.fori_loop` over the candidate rank,
with all blocks advancing in lockstep and per-block early convergence
handled by masking — the TPU-idiomatic shape for data-dependent iteration.

Entry evaluation goes through a device generator (KernelGenerator /
MatrixGenerator): rows/cols are produced on the fly, so an admissible block
costs O(rank * (m + n)) kernel evaluations, never O(m*n).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# compression math must run at full f32 on the MXU: the TPU default
# matmul precision (bf16 passes) visibly degrades ACA residuals
_HI = jax.lax.Precision.HIGHEST


def _pow2_ceil(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _pow2_floor(n: int) -> int:
    return _pow2_ceil(n + 1) // 2 if n >= 1 else 1


def _chunk_cap(per_block_elems: int, itemsize: int = 4) -> int:
    """Largest power-of-two batch size keeping one chunk's dominant operand
    under the configured assembly memory budget.  The budget is calibrated
    in f32 elements; wider dtypes (complex64/f64/complex128) get
    proportionally smaller chunks so the BYTE footprint stays bounded."""
    from ..config import get_config

    budget = (get_config().assembly_chunk_elems * 4) // max(int(itemsize), 4)
    return max(8, _pow2_floor(budget // max(per_block_elems, 1)))


def _ladder_size(nb: int, cap: int) -> int:
    """Smallest size from the 4x ladder {cap, cap/4, cap/16, ..., >=8}
    that is >= nb.  Restricting chunk sizes to this ladder bounds the
    number of distinct compiled programs (each distinct batch size is a
    separate XLA program — expensive to compile/load over a remote link)
    and makes the full program set PREDICTABLE from the plan, which the
    parallel compile warm-up (hmatrix/assembly.py) relies on."""
    s = cap
    while s // 4 >= max(nb, 8):
        s //= 4
    return s


def _chunk_slices(nb: int, cap: int):
    """Yield (start, stop, padded_size) covering [0, nb) in chunks.

    Chunks are `cap`-sized when nb > cap; a single ladder-padded chunk
    otherwise — so compiles are keyed by a bounded set of batch sizes."""
    if nb <= cap:
        yield 0, nb, _ladder_size(nb, cap)
        return
    for i0 in range(0, nb, cap):
        yield i0, min(i0 + cap, nb), cap


def batched_aca(gen, t_idx, s_idx, t_sz, s_sz, rmax: int, eps: float,
                reqrank: int, dtype):
    """Compress one bucket of admissible blocks.

    gen       : device generator with device_rows / device_cols
    t_idx     : (nb, pt) int32 user row indices (clamped in pad region)
    s_idx     : (nb, ps) int32 user col indices
    t_sz,s_sz : (nb,) actual block sizes
    rmax      : static max rank (<= min(pt, ps))
    eps       : blockwise relative Frobenius tolerance (ignored if reqrank>0)
    reqrank   : fixed-rank mode when > 0 (reference `reqrank` ctor arg,
                hmatrix_tree_builder.hpp:23)

    Returns (U (nb,pt,rmax), V (nb,rmax,ps), ranks (nb,), ok (nb,)) with
    columns >= rank zeroed.  ok=False => ACA did not converge (caller
    densifies those blocks).
    """
    t_idx = np.asarray(t_idx, dtype=np.int32)
    s_idx = np.asarray(s_idx, dtype=np.int32)
    t_sz = np.asarray(t_sz, dtype=np.int32)
    s_sz = np.asarray(s_sz, dtype=np.int32)
    nb, pt = t_idx.shape
    ps = s_idx.shape[1]
    ops = generator_operands(gen)
    # ACA state per block ~ pt*rmax + rmax*ps (+ generator row/col evals)
    cap = _chunk_cap((pt + ps) * (int(rmax) + 16) * 2,
                     np.dtype(dtype).itemsize)
    outs = []
    for i0, i1, size in _chunk_slices(nb, cap):
        c = i1 - i0
        ti = np.repeat(t_idx[i1 - 1:i1], size, 0)
        si = np.repeat(s_idx[i1 - 1:i1], size, 0)
        tz = np.zeros(size, np.int32)
        sz = np.zeros(size, np.int32)
        ti[:c], si[:c] = t_idx[i0:i1], s_idx[i0:i1]
        tz[:c], sz[:c] = t_sz[i0:i1], s_sz[i0:i1]
        U, V, rk, ok = _batched_aca_jit(
            gen, int(rmax), float(eps), int(reqrank), np.dtype(dtype),
            ops, jnp.asarray(ti), jnp.asarray(si), jnp.asarray(tz),
            jnp.asarray(sz))
        outs.append((U[:c], V[:c], rk[:c], ok[:c]))
    if len(outs) == 1:
        return outs[0]
    return (jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]),
            jnp.concatenate([o[2] for o in outs]),
            jnp.concatenate([o[3] for o in outs]))


@partial(jax.jit, static_argnames=("p",))
def _pad_rows_jit(a, p: int):
    """Zero-pad `p` rows on the leading axis inside a jit (the zero fill
    becomes a program constant instead of a host->device transfer, which
    the remote backend cannot do for complex dtypes)."""
    return jnp.pad(a, ((0, p),) + ((0, 0),) * (a.ndim - 1))


def truncate_eps_array(eps):
    return jnp.asarray(eps, dtype=jnp.float64
                       if jax.config.jax_enable_x64 else jnp.float32)


def concat_rank_chunks(chunks, dtype):
    """Concatenate per-chunk (U, V, ranks, ok) tuples whose factors were
    trimmed to each chunk's own max rank: pad the rank axis to the overall
    max (device-side), then concatenate along the block axis.

    Fusing truncation into the chunk loop and concatenating *trimmed*
    factors bounds peak memory by the final compressed size, not by
    nb * rmax (the round-1 OOM shape)."""
    rmaxb = max(max(int(np.asarray(r).max(initial=0)) for _, _, r, _ in chunks), 1)
    Us, Vs, rks, oks = [], [], [], []
    for U, V, rk, ok in chunks:
        w = U.shape[2]
        if w < rmaxb:
            U = jnp.concatenate(
                [U, jnp.zeros((U.shape[0], U.shape[1], rmaxb - w),
                              dtype=dtype)], axis=2)
            V = jnp.concatenate(
                [V, jnp.zeros((V.shape[0], rmaxb - w, V.shape[2]),
                              dtype=dtype)], axis=1)
        else:
            U, V = U[:, :, :rmaxb], V[:, :rmaxb, :]
        Us.append(U)
        Vs.append(V)
        rks.append(np.asarray(rk))
        oks.append(np.asarray(ok))
    U = Us[0] if len(Us) == 1 else jnp.concatenate(Us)
    V = Vs[0] if len(Vs) == 1 else jnp.concatenate(Vs)
    return U, V, np.concatenate(rks), np.concatenate(oks)


def generator_operands(gen):
    """The generator's device data as a pytree of DYNAMIC jit operands.

    Passing these as arguments (instead of letting the static `gen` close
    over them) keeps HLO free of large literals: XLA would otherwise
    constant-fold over the embedded (N, dim) / (N, N) arrays — compiles
    measured in MINUTES over a remote TPU link — and the compilation cache
    would key on the data values, never hitting across geometries,
    problem sizes, or per-partition sub-builds."""
    if hasattr(gen, "device_operands"):
        return gen.device_operands()
    return ()


def _gen_rows(gen, ops, t_idx, s_idx):
    if hasattr(gen, "device_rows_ops"):
        return gen.device_rows_ops(ops, t_idx, s_idx)
    return gen.device_rows(t_idx, s_idx)  # legacy closure-capturing path


def _gen_cols(gen, ops, t_idx, s_idx):
    if hasattr(gen, "device_cols_ops"):
        return gen.device_cols_ops(ops, t_idx, s_idx)
    return gen.device_cols(t_idx, s_idx)


def _gen_blocks(gen, ops, t_idx, s_idx):
    if hasattr(gen, "device_blocks_ops"):
        return gen.device_blocks_ops(ops, t_idx, s_idx)
    return gen.device_blocks(t_idx, s_idx)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _batched_aca_jit(gen, rmax, eps, reqrank, dtype, ops, t_idx, s_idx,
                     t_sz, s_sz):
    """jitted ACA core; `gen` is static (hashed by identity) so the XLA
    cache is keyed by (generator, bucket shapes) — one compile per shape."""
    nb, pt = t_idx.shape
    ps = s_idx.shape[1]
    fixed_rank = reqrank > 0
    target_rank = int(reqrank) if fixed_rank else int(rmax)
    # iteration budget: zero-pivot rows are retried (they consume an
    # iteration but no rank slot), so allow some slack beyond target_rank
    niter = target_rank + min(16, pt)
    rdt = jnp.zeros((), dtype=dtype).real.dtype  # real scalar dtype

    arange_nb = jnp.arange(nb)
    row_pos = jnp.arange(pt, dtype=jnp.int32)[None, :]  # (1, pt)
    col_pos = jnp.arange(ps, dtype=jnp.int32)[None, :]
    row_valid = row_pos < t_sz[:, None]  # (nb, pt)
    col_valid = col_pos < s_sz[:, None]
    col_slot = jnp.arange(rmax, dtype=jnp.int32)[None, :]  # (1, rmax)

    def body(state):
        k, U, V, used, next_i, fro2, rank, conv_cnt, stopped = state
        i_k = next_i  # (nb,)
        # residual row at i_k (cast: generator may evaluate in f64 under x64)
        rows = _gen_rows(gen, ops, t_idx[arange_nb, i_k],
                         s_idx).astype(dtype)  # (nb, ps)
        Ui = U[arange_nb, i_k]  # (nb, rmax)
        rows = rows - jnp.einsum("nr,nrj->nj", Ui, V, precision=_HI)
        rows = jnp.where(col_valid, rows, 0)
        absrow = jnp.abs(rows)
        j_k = jnp.argmax(jnp.where(col_valid, absrow, -1.0), axis=1)
        delta = rows[arange_nb, j_k]
        # zero pivot: this row's residual is (numerically) zero. The row
        # is exhausted, but the BLOCK may not be converged — retry with
        # another unused row instead of declaring convergence.
        zero_piv = jnp.abs(delta) <= jnp.finfo(rdt).tiny * 1e3
        safe_delta = jnp.where(zero_piv, 1.0, delta)
        v_k = rows / safe_delta[:, None]
        # residual column at j_k
        cols = _gen_cols(gen, ops, t_idx,
                         s_idx[arange_nb, j_k]).astype(dtype)  # (nb, pt)
        Vj = V[arange_nb, :, j_k]  # (nb, rmax)
        cols = cols - jnp.einsum("nir,nr->ni", U, Vj, precision=_HI)
        u_k = jnp.where(row_valid, cols, 0)

        unorm2 = jnp.sum(jnp.abs(u_k) ** 2, axis=1)
        vnorm2 = jnp.sum(jnp.abs(v_k) ** 2, axis=1)
        c = jnp.einsum("nir,ni->nr", jnp.conj(U), u_k, precision=_HI)
        d = jnp.einsum("nrj,nj->nr", jnp.conj(V), v_k, precision=_HI)
        fro2_new = fro2 + unorm2 * vnorm2 + 2.0 * jnp.real(jnp.sum(c * d, axis=1))
        fro2_new = jnp.maximum(fro2_new, 0.0)

        accept = jnp.logical_not(stopped | zero_piv)
        if fixed_rank:
            inc_conv = jnp.zeros((nb,), dtype=bool)
        else:
            inc_conv = unorm2 * vnorm2 <= (eps * eps) * fro2_new
        # require TWO consecutive sub-eps increments before declaring
        # convergence: a single accidentally-small pivot product must not
        # truncate a block that still carries mass
        conv_cnt = jnp.where(accept,
                             jnp.where(inc_conv, conv_cnt + 1, 0), conv_cnt)
        converged = conv_cnt >= 2

        # write the accepted cross at column `rank` (one-hot outer update:
        # ranks advance per block, not per iteration)
        am = accept.astype(dtype)
        oh = (col_slot == rank[:, None]).astype(dtype) * am[:, None]  # (nb, rmax)
        U = U + u_k[:, :, None] * oh[:, None, :]
        V = V + v_k[:, None, :] * oh[:, :, None]
        used = used.at[arange_nb, i_k].set(used[arange_nb, i_k]
                                           | accept | zero_piv)
        fro2 = jnp.where(accept, fro2_new, fro2)
        rank = rank + accept.astype(jnp.int32)

        # next row pivot: largest |u_k| among unused valid rows (uniform
        # score when retrying after a zero pivot)
        score = jnp.where(zero_piv[:, None], 1.0, jnp.abs(u_k))
        cand = jnp.where(row_valid & jnp.logical_not(used), score, -1.0)
        best = jnp.argmax(cand, axis=1).astype(jnp.int32)
        rows_left = jnp.max(cand, axis=1) >= 0
        # no unused rows left => every row's residual visited: block is
        # exactly represented (dead == success)
        dead = jnp.logical_not(rows_left)
        rank_full = rank >= target_rank
        stopped_new = stopped | converged | dead | rank_full
        next_i = jnp.where(stopped_new, i_k, best)
        return (k + 1, U, V, used, next_i, fro2, rank, conv_cnt,
                stopped_new)

    def cond(state):
        k, *_, stopped = state
        # batch-level early exit once every block has converged
        return (k < niter) & jnp.logical_not(jnp.all(stopped))

    U0 = jnp.zeros((nb, pt, rmax), dtype=dtype)
    V0 = jnp.zeros((nb, rmax, ps), dtype=dtype)
    used0 = jnp.zeros((nb, pt), dtype=bool)
    next_i0 = jnp.zeros((nb,), dtype=jnp.int32)
    fro20 = jnp.zeros((nb,), dtype=rdt)
    rank0 = jnp.zeros((nb,), dtype=jnp.int32)
    cc0 = jnp.zeros((nb,), dtype=jnp.int32)
    stopped0 = jnp.zeros((nb,), dtype=bool)

    _, U, V, used, next_i, fro2, rank, conv_cnt, stopped = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), U0, V0, used0, next_i0, fro20, rank0,
         cc0, stopped0))

    if fixed_rank:
        ok = jnp.ones((nb,), dtype=bool)
    else:
        # success = converged (two consecutive sub-eps increments), or all
        # rows exhausted (exact), or achieved rank covers the full block;
        # blocks that merely hit the rank cap are NOT ok (caller densifies)
        full = rank >= jnp.minimum(t_sz, s_sz)
        no_rows = jnp.logical_not(
            jnp.any(row_valid & jnp.logical_not(used), axis=1))
        ok = (conv_cnt >= 2) | no_rows | full
    return U, V, rank, ok


def batched_truncate(U, V, ranks, eps: float, reqrank: int = -1):
    """Batched QR+SVD re-truncation of padded low-rank factors.

    Reference parity: `recompression(hmatrix)` (hmatrix/hmatrix.hpp:96-99)
    and the post-ACA cleanup pass.  Relative Frobenius criterion per block,
    matching the reference's custom-SVD example semantics
    (example/advanced/define_custom_low_rank_generator.py:13-31).

    Returns (U', V', ranks') with trailing columns zeroed.
    """
    nb, pt, r = U.shape
    ps = V.shape[2]
    if r == 0 or nb == 0:
        return U, V, ranks
    U = jnp.asarray(U)
    V = jnp.asarray(V)
    ranks = jnp.asarray(ranks)
    eps_arr = jnp.asarray(eps, dtype=jnp.float64
                          if jax.config.jax_enable_x64 else jnp.float32)
    # peak operand per block ~ QR workspaces + factors: (pt + ps + 4r) * r
    cap = _chunk_cap((pt + ps + 4 * r) * r, U.dtype.itemsize)
    outs = []
    for i0, i1, size in _chunk_slices(nb, cap):
        c = i1 - i0
        Uc, Vc, rc = U[i0:i1], V[i0:i1], ranks[i0:i1]
        if size != c:
            # jitted pads: an EAGER complex zeros transfers its complex
            # scalar fill host->device, which the remote backend does not
            # implement (utils/complex_io.py)
            Uc = _pad_rows_jit(Uc, p=size - c)
            Vc = _pad_rows_jit(Vc, p=size - c)
            rc = _pad_rows_jit(rc, p=size - c)
        Un, Vn, rn = _batched_truncate_jit(int(reqrank), Uc, Vc, rc, eps_arr)
        outs.append((Un[:c], Vn[:c], rn[:c]))
    if len(outs) == 1:
        return outs[0]
    return (jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]),
            jnp.concatenate([o[2] for o in outs]))


@partial(jax.jit, static_argnums=(0,))
def _batched_truncate_jit(reqrank, U, V, ranks, eps):
    dtype = U.dtype
    nb, pt, r = U.shape
    ps = V.shape[2]
    Qu, Ru = jnp.linalg.qr(U)  # (nb, pt, r), (nb, r, r)
    Vh = jnp.conj(jnp.swapaxes(V, 1, 2))  # (nb, ps, r)
    Qv, Rv = jnp.linalg.qr(Vh)
    core = jnp.einsum("nij,nkj->nik", Ru, jnp.conj(Rv), precision=_HI)  # Ru @ Rv^H (nb, r, r)
    W, s, Zh = jnp.linalg.svd(core, full_matrices=False)
    # per-block truncation rank: smallest r' with tail energy <= eps^2 * total
    s2 = s * s
    total = jnp.sum(s2, axis=1, keepdims=True)
    tail = jnp.cumsum(s2[:, ::-1], axis=1)[:, ::-1]  # tail[i] = sum_{j>=i} s2
    if reqrank > 0:
        keep = jnp.arange(s.shape[1])[None, :] < reqrank
    else:
        keep = tail > (eps * eps) * jnp.maximum(total, jnp.finfo(s.dtype).tiny)
    new_ranks = jnp.sum(keep, axis=1).astype(jnp.int32)
    sk = jnp.where(keep, s, 0.0).astype(dtype)
    Unew = jnp.einsum("nik,nkr->nir", Qu, W * sk[:, None, :], precision=_HI)
    Vnew = jnp.einsum("nrk,njk->nrj", Zh, jnp.conj(Qv), precision=_HI)
    # zero rows of V beyond rank (U already zeroed via sk)
    rmask = (jnp.arange(s.shape[1])[None, :] < new_ranks[:, None])
    Vnew = Vnew * rmask[:, :, None].astype(dtype)
    return Unew, Vnew, new_ranks
