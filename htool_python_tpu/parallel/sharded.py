"""Sharded SPMD execution of distributed H-matrix operators over a Mesh.

TPU-native replacement for the reference's MPI execution model
(SURVEY.md §2.3): instead of P MPI processes each holding its rank's block
row and allgather-ing results, the P block rows live as ONE set of stacked,
padded bucket arrays with a leading partition axis sharded over a 1-D
`jax.sharding.Mesh`; the global-to-global product is a single jitted
shard_map program:

    replicate x  ->  per-device bucketed gather-GEMM-scatter (its block row)
                 ->  all_gather of the target segments (XLA collective on ICI)

The DDM one-level preconditioner shards the same way: the subdomain batch
axis of the padded LU factors lives on the mesh, each device solves its
subdomains, and contributions are psum-reduced.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

def make_mesh(n_devices: int | None = None, axis: str = "p") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _stack_partition_data(hmatrices, n_pad_x, t_max):
    """Stack P block-row HMatrices into uniform per-shape bucket arrays with
    a leading partition axis (zero blocks pad partitions that lack a shape).

    Returns a pytree:
      {'dense': [(D (P,nb,pt,ps), t_off (P,nb), s_off, mir, mg, msc)],
       'lr':    [(U, V, t_off, s_off, mir, mg, msc)]}
    t_off indexes the partition-local padded output (length t_max + pad),
    s_off the global padded input.  Symmetric block-row plans flag mirror
    blocks (partition-diagonal triangle): `mir` (0/1), `mg` = the mirror's
    x gather offset (global, = absolute t offset) and `msc` = its y scatter
    offset (partition-local, = s_off - partition base).  Padding blocks
    scatter into the dummy tail region.
    """
    Pn = len(hmatrices)
    shapes_dense, shapes_lr = {}, {}
    for p, h in enumerate(hmatrices):
        for (D, *_), b in zip(h._data["dense"], h.plan.dense_buckets):
            shapes_dense.setdefault((b.pt, b.ps), [0] * Pn)[p] = b.nb
        for (Ut, V, *_), b in zip(h._data["lr"], h.plan.lowrank_buckets):
            # storage is rank-major: Ut (nb, r, pt)
            shapes_lr.setdefault((b.pt, Ut.shape[1], b.ps), [0] * Pn)[p] = b.nb

    def _offsets(h, b):
        """(local t_off, global s_off, mirror, mirror-gather, mirror-scatter)
        for one bucket of one partition's plan."""
        tb = h.plan.target_offset if h.plan.t_off_absolute else 0
        t_loc = b.t_off - tb
        mir = b.mirror.astype(np.int32)
        mg = np.where(b.mirror, b.t_off + (0 if h.plan.t_off_absolute
                                           else h.plan.target_offset), 0)
        msc = np.where(b.mirror,
                       b.s_off - (h.plan.target_offset), 0)
        return t_loc, b.s_off, mir, mg, msc

    dtype = hmatrices[0].dtype
    dense_stacked = []
    for (pt, ps), counts in sorted(shapes_dense.items()):
        nb = max(counts)
        D = np.zeros((Pn, nb, pt, ps), dtype=dtype)
        t_off = np.full((Pn, nb), t_max, dtype=np.int32)  # pad -> dummy tail
        s_off = np.full((Pn, nb), n_pad_x - ps, dtype=np.int32)
        mir = np.zeros((Pn, nb), dtype=np.int32)
        mg = np.full((Pn, nb), n_pad_x - pt, dtype=np.int32)
        msc = np.full((Pn, nb), t_max, dtype=np.int32)
        for p, h in enumerate(hmatrices):
            for (Dh, *_), b in zip(h._data["dense"], h.plan.dense_buckets):
                if (b.pt, b.ps) != (pt, ps):
                    continue
                D[p, :b.nb] = np.asarray(Dh)
                tl, so, mi, g, sc = _offsets(h, b)
                t_off[p, :b.nb] = tl
                s_off[p, :b.nb] = so
                mir[p, :b.nb] = mi
                mg[p, :b.nb] = np.where(mi, g, n_pad_x - pt)
                msc[p, :b.nb] = np.where(mi, sc, t_max)
        dense_stacked.append(tuple(jnp.asarray(a)
                                   for a in (D, t_off, s_off, mir, mg, msc)))
    lr_stacked = []
    for (pt, r, ps), counts in sorted(shapes_lr.items()):
        nb = max(counts)
        U = np.zeros((Pn, nb, r, pt), dtype=dtype)  # rank-major Ut
        V = np.zeros((Pn, nb, r, ps), dtype=dtype)
        t_off = np.full((Pn, nb), t_max, dtype=np.int32)
        s_off = np.full((Pn, nb), n_pad_x - ps, dtype=np.int32)
        mir = np.zeros((Pn, nb), dtype=np.int32)
        mg = np.full((Pn, nb), n_pad_x - pt, dtype=np.int32)
        msc = np.full((Pn, nb), t_max, dtype=np.int32)
        for p, h in enumerate(hmatrices):
            for (Uh, Vh, *_), b in zip(h._data["lr"], h.plan.lowrank_buckets):
                if (b.pt, Uh.shape[1], b.ps) != (pt, r, ps):
                    continue
                U[p, :b.nb] = np.asarray(Uh)
                V[p, :b.nb] = np.asarray(Vh)
                tl, so, mi, g, sc = _offsets(h, b)
                t_off[p, :b.nb] = tl
                s_off[p, :b.nb] = so
                mir[p, :b.nb] = mi
                mg[p, :b.nb] = np.where(mi, g, n_pad_x - pt)
                msc[p, :b.nb] = np.where(mi, sc, t_max)
        lr_stacked.append(tuple(jnp.asarray(a)
                                for a in (U, V, t_off, s_off, mir, mg, msc)))
    return {"dense": dense_stacked, "lr": lr_stacked}


def _gather_seg(x_pad, off, width):
    return x_pad[off[:, None] + jnp.arange(width, dtype=jnp.int32)[None, :]]


def _scatter_seg(y, off, vals):
    idx = off[:, None] + jnp.arange(vals.shape[1], dtype=jnp.int32)[None, :]
    return y.at[idx].add(vals)


def _local_block_row_apply_trans(data, x_loc_pad, n_pad_x, sym, trans):
    """One partition's transposed block-row product: its LOCAL target
    segment x_loc (padded) -> a GLOBAL source-length contribution (to be
    psum-reduced over the mesh).  trans in {'T','C'}.

    Stored main block B at (t_loc, s_glob) contributes B^(trans) x[t_loc]
    into y[s_glob]; a mirror block sigma(B) at (msc, mg) contributes
    sigma(B)^(trans) x[msc] into y[mg].  All per-bucket math goes through
    the block-term primitives in ops/matvec.py (single source of truth for
    the rank-major low-rank layout)."""
    from ..ops.matvec import (dense_block_term, dense_block_term_t,
                              lowrank_block_term, lowrank_block_term_t)

    dt = x_loc_pad.dtype
    y = jnp.zeros((n_pad_x, x_loc_pad.shape[1]), dtype=dt)
    conj_main = trans == "C"
    # sigma(B)^(trans): conjugate iff exactly one of {trans=='C', sym=='H'}
    conj_mirror = (trans == "C") != (sym == "H")
    for D, t_off, s_off, mir, mg, msc in data["dense"]:
        pt, ps = D.shape[1], D.shape[2]
        xg = _gather_seg(x_loc_pad, t_off, pt)
        y = _scatter_seg(y, s_off,
                         dense_block_term_t(D, xg, conj=conj_main, dtype=dt))
        if sym != "N":
            m = mir.astype(dt)[:, None, None]
            xg = _gather_seg(x_loc_pad, msc, ps)
            y = _scatter_seg(y, mg,
                             dense_block_term(D, xg, conj=conj_mirror,
                                              dtype=dt) * m)
    for Ut, V, t_off, s_off, mir, mg, msc in data["lr"]:
        pt, ps = Ut.shape[2], V.shape[2]
        xg = _gather_seg(x_loc_pad, t_off, pt)
        y = _scatter_seg(y, s_off,
                         lowrank_block_term_t(Ut, V, xg, conj=conj_main,
                                              dtype=dt))
        if sym != "N":
            m = mir.astype(dt)[:, None, None]
            xg = _gather_seg(x_loc_pad, msc, ps)
            y = _scatter_seg(y, mg,
                             lowrank_block_term(Ut, V, xg, conj=conj_mirror,
                                                dtype=dt) * m)
    return y


def _local_block_row_apply(data, x_pad, t_pad_len, sym="N"):
    """One partition's block-row product: x replicated -> local y segment.
    Mirror blocks (symmetric partition-diagonal triangle) add their
    (conj-)transposed contribution at partition-local offsets.  Per-bucket
    math goes through the ops/matvec.py block-term primitives."""
    from ..ops.matvec import (dense_block_term, dense_block_term_t,
                              lowrank_block_term, lowrank_block_term_t)

    dt = x_pad.dtype
    y = jnp.zeros((t_pad_len, x_pad.shape[1]), dtype=dt)
    conj_mirror = sym == "H"
    for D, t_off, s_off, mir, mg, msc in data["dense"]:
        pt, ps = D.shape[1], D.shape[2]
        xg = _gather_seg(x_pad, s_off, ps)
        y = _scatter_seg(y, t_off, dense_block_term(D, xg, dtype=dt))
        if sym != "N":
            m = mir.astype(dt)[:, None, None]
            xg = _gather_seg(x_pad, mg, pt)
            y = _scatter_seg(y, msc,
                             dense_block_term_t(D, xg, conj=conj_mirror,
                                                dtype=dt) * m)
    for Ut, V, t_off, s_off, mir, mg, msc in data["lr"]:
        pt, ps = Ut.shape[2], V.shape[2]
        xg = _gather_seg(x_pad, s_off, ps)
        y = _scatter_seg(y, t_off, lowrank_block_term(Ut, V, xg, dtype=dt))
        if sym != "N":
            m = mir.astype(dt)[:, None, None]
            xg = _gather_seg(x_pad, mg, pt)
            y = _scatter_seg(y, msc,
                             lowrank_block_term_t(Ut, V, xg,
                                                  conj=conj_mirror,
                                                  dtype=dt) * m)
    return y


class ShardedDistributedOperator:
    """Mesh-sharded global-to-global operator from per-partition block-row
    HMatrices (as produced by DefaultApproximationBuilder).

    Accepts a 1-D partition mesh or a multi-axis mesh (e.g. the 2-D
    hosts x per-host-devices mesh from parallel/multihost.make_hybrid_mesh)
    — the partition axis is sharded over ALL mesh axes in order, so on a
    hybrid mesh consecutive partitions stay on one host and the product's
    collectives cross DCN only at host boundaries."""

    def __init__(self, hmatrices, target_cluster, source_cluster,
                 mesh: Mesh | None = None):
        self.hmatrices = list(hmatrices)
        self.target_cluster = target_cluster
        self.source_cluster = source_cluster
        Pn = len(self.hmatrices)
        self.mesh = mesh if mesh is not None else make_mesh(Pn)
        if self.mesh.devices.size != Pn:
            raise ValueError(
                f"mesh has {self.mesh.devices.size} devices but there are "
                f"{Pn} partitions")
        self.axes = tuple(self.mesh.axis_names)
        self.n_partitions = Pn
        nt, ns = target_cluster.get_size(), source_cluster.get_size()
        self.shape = (nt, ns)
        max_dim = 1
        for h in self.hmatrices:
            for b in h.plan.dense_buckets + h.plan.lowrank_buckets:
                max_dim = max(max_dim, b.pt, b.ps)
        self.t_sizes = np.array([h.shape[0] for h in self.hmatrices])
        self.t_offsets = np.array(
            [h.plan.target_offset for h in self.hmatrices])
        self.t_max = int(self.t_sizes.max())
        self.t_pad_len = self.t_max + max_dim
        self.n_pad_x = ns + max_dim
        self._data = _stack_partition_data(self.hmatrices, self.n_pad_x,
                                           self.t_max)
        self._shard_data()
        self._jitted = {}

    def _shard_data(self):
        spec_leaf = NamedSharding(self.mesh, P(self.axes))
        self._data = jax.tree.map(
            lambda a: jax.device_put(a, spec_leaf), self._data)
        perm_s = self.source_cluster.get_permutation()
        perm_t = self.target_cluster.get_permutation()
        inv_t = np.empty_like(perm_t)
        inv_t[perm_t] = np.arange(len(perm_t))
        inv_s = np.empty_like(perm_s)
        inv_s[perm_s] = np.arange(len(perm_s))
        rep = NamedSharding(self.mesh, P(None))
        self._perm_s = jax.device_put(jnp.asarray(perm_s), rep)
        self._perm_t = jax.device_put(jnp.asarray(perm_t), rep)
        self._inv_perm_t = jax.device_put(jnp.asarray(inv_t), rep)
        self._inv_perm_s = jax.device_put(jnp.asarray(inv_s), rep)

    def _get_fn(self, k, trans="N"):
        """One jitted device program for the full global-to-global product
        in user numbering: permute -> pad -> shard_map block-row products
        (+ psum for transposed products) -> concat -> un-permute."""
        key = (k, trans)
        if key in self._jitted:
            return self._jitted[key]
        mesh = self.mesh
        t_pad_len = self.t_pad_len
        n_pad_x = self.n_pad_x
        sym = self.hmatrices[0].symmetry
        nt, ns = self.shape
        order = np.argsort(self.t_offsets)
        offs = [int(self.t_offsets[p]) for p in order]
        sizes = [int(self.t_sizes[p]) for p in order]
        perm_s, perm_t = self._perm_s, self._perm_t
        inv_t, inv_s = self._inv_perm_t, self._inv_perm_s
        op_dtype = self.hmatrices[0].dtype
        axes = self.axes

        if trans == "N":
            @partial(jax.shard_map, mesh=mesh,
                     in_specs=(P(axes), P(None, None)),
                     out_specs=P(axes, None))
            def sharded_apply(data, x_pad):
                data = jax.tree.map(lambda a: a[0], data)
                y_local = _local_block_row_apply(data, x_pad, t_pad_len, sym)
                return y_local[None]  # (1, t_pad_len, k) per device

            def global_apply(data, x2d):
                dtype = jnp.result_type(x2d.dtype, op_dtype)
                x_pad = jnp.zeros((n_pad_x, k), dtype=dtype)
                x_pad = x_pad.at[:ns].set(x2d[perm_s].astype(dtype))
                y_parts = sharded_apply(data, x_pad)  # (P, t_pad_len, k)
                y_int = jnp.concatenate(
                    [y_parts[p, :sz] for p, sz in zip(order, sizes)])
                return y_int[inv_t]
        else:
            @partial(jax.shard_map, mesh=mesh,
                     in_specs=(P(axes), P(axes, None, None)),
                     out_specs=P(None, None))
            def sharded_apply_t(data, x_parts):
                data = jax.tree.map(lambda a: a[0], data)
                y = _local_block_row_apply_trans(data, x_parts[0], n_pad_x,
                                                 sym, trans)
                return jax.lax.psum(y, axes)

            def global_apply(data, x2d):
                dtype = jnp.result_type(x2d.dtype, op_dtype)
                x_int = x2d[perm_t].astype(dtype)
                segs = []
                for p in range(self.n_partitions):
                    o, s = int(self.t_offsets[p]), int(self.t_sizes[p])
                    seg = jnp.zeros((t_pad_len, k), dtype=dtype)
                    segs.append(seg.at[:s].set(x_int[o:o + s]))
                x_parts = jnp.stack(segs)  # (P, t_pad_len, k)
                y_pad = sharded_apply_t(data, x_parts)  # (n_pad_x, k)
                return y_pad[:ns][inv_s]

        self._jitted[key] = jax.jit(global_apply)
        return self._jitted[key]

    def build_device_apply(self, trans: str = "N"):
        """Traceable x2d (n, k) -> y2d (n, k) application for the
        device-resident Krylov loop.

        The sharded bucket data is exposed via the `operands` attribute
        (solvers/krylov.py _bind_operator protocol) so outer jits pass it
        as an ARGUMENT: under multi-process `jax.distributed` the global
        arrays span non-addressable devices and cannot be jit closure
        constants.  Single-argument calls `apply(x2d)` still work."""
        data = self._data

        def apply(*args):
            if len(args) == 1:
                ops, x2d = data, args[0]
            else:
                ops, x2d = args
            return self._get_fn(x2d.shape[1], trans)(ops, x2d)

        apply.operands = data
        return apply

    def matvec_global(self, x, trans: str = "N"):
        """Global-to-global product in user numbering ('N', 'T' or 'C').
        A jax-array input stays device-resident and a jax array is
        returned; numpy in -> numpy out."""
        device_io = isinstance(x, jnp.ndarray)
        x = jnp.asarray(x)
        squeeze = x.ndim == 1
        x2 = x[:, None] if squeeze else x
        y = self._get_fn(x2.shape[1], trans)(self._data, x2)
        y = y[:, 0] if squeeze else y
        return y if device_io else np.asarray(y)

    def __mul__(self, x):
        return self.matvec_global(x)

    def __matmul__(self, X):
        return self.matvec_global(X)


def sharded_block_solve(mesh: Mesh, lu, piv, idx_pad, weights, n: int):
    """Build a jitted sharded one-level preconditioner application:
    r (n, k) -> sum_p R_p^T D_p A_p^{-1} R_p r, subdomain batch on the mesh.

    lu (P, m, m), piv (P, m), idx_pad (P, m) global user indices (pad -> n),
    weights (P, m).
    """
    import jax.scipy.linalg as jsl

    axes = tuple(mesh.axis_names)
    spec = NamedSharding(mesh, P(axes))
    lu = jax.device_put(lu, spec)
    piv = jax.device_put(piv, spec)
    idx_pad = jax.device_put(jnp.asarray(idx_pad), spec)
    weights = jax.device_put(jnp.asarray(weights), spec)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axes), P(axes), P(axes), P(axes), P(None, None)),
             out_specs=P(None, None))
    def apply(lu_l, piv_l, idx_l, w_l, r_ext):
        X = r_ext[idx_l]  # (pp, m, k)
        Z = jsl.lu_solve((lu_l, piv_l), X) * w_l[:, :, None]
        out = jnp.zeros_like(r_ext)
        out = out.at[idx_l].add(Z)
        return jax.lax.psum(out, axes)

    def device_apply(*args):
        """Traceable (n, k) -> (n, k) device application (for the
        device-resident Krylov loop).  Factor state is exposed via
        `operands` (see ShardedDistributedOperator.build_device_apply)."""
        if len(args) == 1:
            (lu_l, piv_l, idx_l, w_l), r2d = device_apply.operands, args[0]
        else:
            (lu_l, piv_l, idx_l, w_l), r2d = args
        r_ext = jnp.concatenate(
            [r2d, jnp.zeros((1, r2d.shape[1]), dtype=r2d.dtype)])
        return apply(lu_l, piv_l, idx_l, w_l, r_ext)[:n]

    device_apply.operands = (lu, piv, idx_pad, weights)

    def precond(r):
        device_io = isinstance(r, jnp.ndarray)
        r = jnp.asarray(r)
        squeeze = r.ndim == 1
        r2 = r[:, None] if squeeze else r
        out = device_apply(r2)
        out = out[:, 0] if squeeze else out
        return out if device_io else np.asarray(out)

    precond.device_apply = device_apply
    return precond
