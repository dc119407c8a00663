"""HMatrix: the compressed hierarchical operator, and its tree builder.

Reference parity: `HMatrix` / `HMatrixTreeBuilder`
(src/htool/hmatrix/hmatrix.hpp:27-139, hmatrix_tree_builder.hpp:10-44).
State is a host-side BlockPlan + per-bucket device arrays (a pytree), so
products jit/shard cleanly.  Products run in the cluster-internal numbering
on device; user-numbering permutations are applied at the boundary
(convention pinned at tests/test_distributed_operator.py:105-129:
x_internal = x_user[perm], y_user[perm] = y_internal).
"""

from __future__ import annotations

import copy as _copy

import numpy as np

import jax.numpy as jnp

from ..clustering.cluster import Cluster
from ..config import get_config
from ..ops.matvec import apply_hmatrix, apply_hmatrix_user, pack_bucket_data
from ..utils.complex_io import to_device, to_host
from .assembly import assemble
from .plan import BlockPlan, build_block_plan


from functools import partial as _partial

import jax as _jax


@_partial(_jax.jit, static_argnames=("shape", "dtype"))
def _zeros_jit(shape, dtype):
    """Zeros built ON DEVICE: an eager complex jnp.zeros transfers its
    complex scalar fill, which the remote backend does not implement."""
    return jnp.zeros(shape, dtype)


def _reduced_info_dict(tuples: list[np.ndarray]) -> dict:
    """Merge `_information_tuple` rows (one per rank/partition) into the
    reference's reduced info dict (hmatrix.hpp:52-54 semantics: sums for
    sizes/blocks/storage, min/max/mean over ranks)."""
    a = np.stack(tuples)
    rows = int(a[:, 0].sum())
    cols = int(a[0, 1])  # every piece spans the full source width
    dense_b = int(a[:, 2].sum())
    lr_b = int(a[:, 3].sum())
    stored = int(a[:, 4].sum())
    nbytes = int(a[:, 5].sum())
    rank_count = int(a[:, 9].sum())
    min_rank = int(a[:, 6].min()) if rank_count else 0
    max_rank = int(a[:, 7].max())
    mean_rank = (float(a[:, 8].sum()) / rank_count) if rank_count else 0.0
    total = max(rows * cols, 1)
    return {
        "Number_of_rows": str(rows),
        "Number_of_columns": str(cols),
        "Number_of_dense_blocks": str(dense_b),
        "Number_of_low_rank_blocks": str(lr_b),
        "Compression_ratio": str(total / max(stored, 1)),
        "Space_saving": str(1.0 - stored / total),
        "Storage_size_in_bytes": str(nbytes),
        "Min_rank": str(min_rank),
        "Max_rank": str(max_rank),
        "Mean_rank": str(mean_rank),
    }


def reduce_hmatrix_information(hmatrices) -> dict:
    """Reduce info over a collection of H-matrices held in ONE process (the
    SPMD analog of the reference's per-rank MPI reduction)."""
    return _reduced_info_dict([h._information_tuple() for h in hmatrices])


class HMatrix:
    """Compressed operator over (target_cluster × source_cluster)."""

    def __init__(self, plan: BlockPlan, dense_arrays, lr_arrays, lr_ranks,
                 epsilon, dtype):
        self.plan = plan
        self._data = pack_bucket_data(plan.dense_buckets, dense_arrays,
                                      plan.lowrank_buckets, lr_arrays)
        self._lr_ranks = [np.asarray(r) for r in lr_ranks]
        self.epsilon = float(epsilon)
        self.eta = float(plan.eta)
        self.symmetry = plan.symmetry
        self.UPLO = plan.UPLO
        self.dtype = np.dtype(dtype)
        self._factorization = None  # set by lu/cholesky_factorization
        self._dev_perms = None  # lazy device permutation cache
        self._planes_cache = None  # complex64 re/im plane split (TPU path)
        self._aligned_cache = None  # f32 lane-aligned low-rank layout
        self._compacted = False  # True once compact_for_products freed _data
        # True when every low-rank leaf is an exact SVD triple (set by the
        # builder for default assembly paths): recompression then runs the
        # O(stored bytes) trim instead of the QR+SVD pass
        self._lr_svd_form = False

        nt, ns = plan.nb_rows, plan.nb_cols
        maxdim = max([b.pt for b in plan.dense_buckets + plan.lowrank_buckets]
                     + [b.ps for b in plan.dense_buckets + plan.lowrank_buckets]
                     + [1])
        # +384 slack and 128-multiple length: the Pallas kernels read/write
        # 128-ALIGNED rotate windows (ops/pallas_matvec.py _win_width) that
        # can extend up to 255 lanes past a segment's end, from a base up
        # to 127 lanes before its start
        self._pad_len = -(-(max(nt, ns) + maxdim + 384) // 128) * 128

    # ------------------------------------------------------------------
    @property
    def shape(self):
        return (self.plan.nb_rows, self.plan.nb_cols)

    @property
    def nb_rows(self):
        return self.plan.nb_rows

    @property
    def nb_cols(self):
        return self.plan.nb_cols

    def get_target_cluster(self) -> Cluster:
        return self.plan.target_cluster

    def get_source_cluster(self) -> Cluster:
        return self.plan.source_cluster

    def is_root(self) -> bool:
        """True if this H-matrix covers the full target and source trees."""
        p = self.plan
        return (p.target_offset == 0
                and p.nb_rows == len(p.target_root.get_permutation())
                and p.source_offset == 0
                and p.nb_cols == len(p.source_root.get_permutation()))

    # ------------------------------------------------------------------
    # products
    def _product_data(self):
        """The data pytree products consume.

        Two cached Pallas-native storage variants exist beside the
        canonical `_data` (both leave it untouched for densify /
        recompression / sharding):

        * complex64, unsymmetric: the re/im f32 plane split
          (ops/matvec.py split_planes) — the real fused kernel runs over
          plane pairs; the XLA complex gather/scatter path measured ~20x
          slower at N=40000.
        * real f32: the lane-aligned low-rank layout (align_lowrank) —
          factors pre-shifted so the kernel's per-block loads/stores are
          aligned slices instead of dynamic rotates (~0.9 ms of the 2.1 ms
          N=40000 product).

        Caches cost extra HBM while both representations are alive;
        `compact_for_products` frees the canonical arrays."""
        import jax

        from ..config import get_config
        from ..ops.matvec import align_lowrank, planes_supported, \
            split_planes
        from ..ops.pallas_matvec import pallas_supported

        forced = get_config().matvec_backend
        if forced == "xla" and self._data is not None:
            return self._data  # explicit XLA override beats the caches
        on_pallas = forced == "pallas" or jax.default_backend() == "tpu"

        if self.dtype == np.complex64:
            if self._planes_cache is None:
                if not on_pallas or not planes_supported(
                        self._data, self._pad_len, 1, self.dtype,
                        self.symmetry):
                    return self._data
                self._planes_cache = split_planes(self._data)
            return self._planes_cache

        if self.dtype == np.float32 and get_config().matvec_aligned_layout:
            if self._aligned_cache is False:  # memoized rejection: the
                return self._data             # re-layout runs at most once
            if self._aligned_cache is None:
                if (not on_pallas or self._data is None
                        or not self._data["lr"]):
                    return self._data
                cand = align_lowrank(self._data)
                if not pallas_supported(cand["aligned"], self._pad_len, 1,
                                        self.dtype):
                    self._aligned_cache = False
                    return self._data
                self._aligned_cache = cand
            return self._aligned_cache

        return self._data

    def compact_for_products(self) -> None:
        """Convert to the product-only storage layout, freeing the
        assembly-layout arrays.  For complex64 'N' operators this builds
        the re/im plane split LEAF BY LEAF, releasing each complex bucket
        as soon as its planes exist — peak device memory is the operator
        size plus ONE bucket, so near-HBM-sized Helmholtz operators can
        still convert.  Densification / recompression need the assembly
        arrays — call this only when the remaining work is
        products/solves.  No-op otherwise."""
        import jax

        from ..config import get_config
        from ..ops.matvec import planes_supported

        forced = get_config().matvec_backend
        on_pallas = forced == "pallas" or jax.default_backend() == "tpu"
        if (self.dtype == np.complex64
                and self._planes_cache is None and self._data is not None
                and forced != "xla" and on_pallas
                and planes_supported(self._data, self._pad_len, 1,
                                     self.dtype, self.symmetry)):
            def split_entry(entry):
                *mats, t, s, m = entry
                planes = []
                for a in mats:
                    planes.append(jnp.real(a).astype(jnp.float32))
                    planes.append(jnp.imag(a).astype(jnp.float32))
                jax.block_until_ready(planes[-1])
                return tuple(planes) + (t, s, m)

            cd, cl = [], []
            for i, e in enumerate(self._data["dense"]):
                cd.append(split_entry(e))
                self._data["dense"][i] = None  # free the complex bucket
            for i, e in enumerate(self._data["lr"]):
                cl.append(split_entry(e))
                self._data["lr"][i] = None
            self._planes_cache = {"cplanes": {"dense": cd, "lr": cl}}
            self._data = None
            self._compacted = True
            return
        pd = self._product_data()
        if pd is not self._data:
            self._data = None
            self._compacted = True

    def _assembly_data(self):
        """The canonical bucket arrays, with an actionable error once
        compact_for_products has freed them (product-only storage)."""
        if self._data is None and self._compacted:
            raise RuntimeError(
                "assembly arrays were freed by compact_for_products(); "
                "densify/recompression/factorization need them — rebuild "
                "the operator or skip compaction")
        return self._data

    def _apply_internal_2d(self, x2d, trans: str, data=None):
        """x2d: (nin, k) in internal numbering. Returns (nout, k).

        Symmetric block-row plans (t_off_absolute) run in absolute
        coordinates: the target segment is placed at / sliced from the
        plan's target_offset.

        `data` overrides the bucket arrays (same pytree structure as
        `self._data`, or a plane-split pytree): callers that jit an outer
        program pass the device arrays as ARGUMENTS through this hook
        instead of closing over them (the `operands` protocol,
        solvers/krylov.py `_bind_operator`), so compiled programs are
        keyed by shapes only — never embedding the H-matrix data as HLO
        constants."""
        if data is None:
            data = self._product_data()
        nt, ns = self.shape
        nin = ns if trans == "N" else nt
        nout = nt if trans == "N" else ns
        if x2d.shape[0] != nin:
            raise ValueError(f"expected input of size {nin}, got {x2d.shape[0]}")
        t_base = self.plan.target_offset if self.plan.t_off_absolute else 0
        in_base = 0 if trans == "N" else t_base
        out_base = t_base if trans == "N" else 0
        dtype = np.result_type(self.dtype, x2d.dtype)
        # complex-safe: jnp.zeros(complex) / jnp.asarray(complex ndarray)
        # are host->device transfers the remote backend cannot do
        x_dev = to_device(x2d, dtype)
        x_pad = _zeros_jit((self._pad_len, x2d.shape[1]), np.dtype(dtype))
        x_pad = x_pad.at[in_base:in_base + nin].set(x_dev)
        y_pad = apply_hmatrix(data, x_pad, self._pad_len,
                              trans, self.symmetry)
        return y_pad[out_base:out_base + nout]

    def matvec_internal(self, x, trans: str = "N", data=None):
        x = to_device(x)
        squeeze = x.ndim == 1
        y = self._apply_internal_2d(x[:, None] if squeeze else x, trans, data)
        return y[:, 0] if squeeze else y

    def _device_perms(self, trans: str):
        """(perm_in, inv_perm_out) device arrays for user-numbering products,
        cached per trans direction."""
        if self._dev_perms is None:
            self._dev_perms = {}
        key = "N" if trans == "N" else "T"
        if key not in self._dev_perms:
            perm_t = self.plan.target_root.get_permutation()
            perm_s = self.plan.source_root.get_permutation()
            perm_in = perm_s if key == "N" else perm_t
            perm_out = perm_t if key == "N" else perm_s
            inv_out = np.empty_like(perm_out)
            inv_out[perm_out] = np.arange(len(perm_out))
            self._dev_perms[key] = (jnp.asarray(perm_in),
                                    jnp.asarray(inv_out))
        return self._dev_perms[key]

    def matvec(self, x, trans: str = "N"):
        """Product in user numbering (root H-matrices).  For sub-blocks
        (local H-matrices) internal == local numbering; use matvec_internal.

        Accepts numpy or jax input; a jax input stays device-resident and a
        jax array is returned (no host synchronization)."""
        if not self.is_root():
            return to_host(self.matvec_internal(x, trans))
        device_io = isinstance(x, jnp.ndarray)
        perm_in, inv_out = self._device_perms(trans)
        x = to_device(x)
        if x.shape[0] != perm_in.shape[0]:
            raise ValueError(
                f"expected input of size {perm_in.shape[0]}, got {x.shape[0]}")
        squeeze = x.ndim == 1
        x2d = x[:, None] if squeeze else x
        nout = self.shape[0] if trans == "N" else self.shape[1]
        from ..ops.matvec import resolve_backend
        data = self._product_data()
        backend = resolve_backend(data, self._pad_len, x2d.shape[1],
                                  np.result_type(self.dtype, x.dtype),
                                  self.symmetry)
        y = apply_hmatrix_user(data, perm_in, inv_out, x2d,
                               self._pad_len, trans, self.symmetry, nout,
                               backend)
        y = y[:, 0] if squeeze else y
        return y if device_io else to_host(y)

    def __mul__(self, x):
        x = np.asarray(x)
        if x.ndim != 1:
            raise ValueError("use @ for matrices")
        return self.matvec(x)

    def __matmul__(self, X):
        X = np.asarray(X)
        if X.ndim == 1:
            return self.matvec(X)
        return self.matvec(X)

    # ------------------------------------------------------------------
    # densification
    def to_dense(self) -> np.ndarray:
        """Dense matrix in the cluster-internal numbering of this block."""
        nt, ns = self.shape
        tb = self.plan.target_offset if self.plan.t_off_absolute else 0
        out = np.zeros((nt, ns), dtype=self.dtype)
        for (D, t_off, s_off, mirror), b in zip(self._assembly_data()["dense"],
                                                self.plan.dense_buckets):
            Dh = to_host(D)
            for i in range(b.nb):
                blk = Dh[i, :b.t_sz[i], :b.s_sz[i]]
                out[b.t_off[i] - tb:b.t_off[i] - tb + b.t_sz[i],
                    b.s_off[i]:b.s_off[i] + b.s_sz[i]] = blk
                if b.mirror[i]:
                    m = blk.conj().T if self.symmetry == "H" else blk.T
                    out[b.s_off[i] - tb:b.s_off[i] - tb + b.s_sz[i],
                        b.t_off[i]:b.t_off[i] + b.t_sz[i]] = m
        for (Ut, V, t_off, s_off, mirror), b in zip(self._data["lr"],
                                                    self.plan.lowrank_buckets):
            Uh, Vh = to_host(Ut), to_host(V)
            for i in range(b.nb):
                blk = Uh[i, :, :b.t_sz[i]].T @ Vh[i, :, :b.s_sz[i]]
                out[b.t_off[i] - tb:b.t_off[i] - tb + b.t_sz[i],
                    b.s_off[i]:b.s_off[i] + b.s_sz[i]] = blk
                if b.mirror[i]:
                    m = blk.conj().T if self.symmetry == "H" else blk.T
                    out[b.s_off[i] - tb:b.s_off[i] - tb + b.s_sz[i],
                        b.t_off[i]:b.t_off[i] + b.t_sz[i]] = m
        return out

    def to_dense_in_user_numbering(self) -> np.ndarray:
        """Dense matrix with rows/cols in user numbering.  For sub-blocks the
        rows/cols are this block's points ordered by ascending user index."""
        a = self.to_dense()
        p = self.plan
        perm_t = p.target_root.get_permutation()[
            p.target_offset:p.target_offset + p.nb_rows]
        perm_s = p.source_root.get_permutation()[
            p.source_offset:p.source_offset + p.nb_cols]
        if self.is_root():
            out = np.empty_like(a)
            out[np.ix_(perm_t, perm_s)] = a
            return out
        rt = np.argsort(perm_t)
        rs = np.argsort(perm_s)
        return a[np.ix_(rt, rs)]

    # ------------------------------------------------------------------
    # factorizations (reference: hmatrix.hpp:58-94); implemented in
    # factorization.py; in-place contract matches the reference (deepcopy
    # before factorizing, example/use_ddm_solver.py:49-51)
    def lu_factorization(self):
        from .factorization import lu_factorization
        lu_factorization(self)

    def cholesky_factorization(self, UPLO: str = "L"):
        from .factorization import cholesky_factorization
        cholesky_factorization(self, UPLO)

    def lu_solve(self, trans: str, b):
        from .factorization import lu_solve
        return lu_solve(self, trans, b)

    def cholesky_solve(self, UPLO: str, b):
        from .factorization import cholesky_solve
        return cholesky_solve(self, UPLO, b)

    # ------------------------------------------------------------------
    def __deepcopy__(self, memo):
        new = object.__new__(HMatrix)
        new.plan = self.plan  # immutable plan shared
        # jnp arrays are immutable -> safe to share, but the CONTAINERS
        # must be copied: recompression frees consumed buckets in place
        # (data["lr"][bi] = None) and a shared dict would poison siblings
        new._data = (None if self._data is None else
                     {"dense": list(self._data["dense"]),
                      "lr": list(self._data["lr"])})
        new._lr_ranks = [r.copy() for r in self._lr_ranks]
        new.epsilon = self.epsilon
        new.eta = self.eta
        new.symmetry = self.symmetry
        new.UPLO = self.UPLO
        new.dtype = self.dtype
        new._factorization = None
        new._dev_perms = self._dev_perms  # immutable device arrays
        new._planes_cache = self._planes_cache  # immutable device arrays
        new._aligned_cache = self._aligned_cache
        new._compacted = self._compacted
        new._lr_svd_form = self._lr_svd_form
        new._pad_len = self._pad_len
        return new

    # ------------------------------------------------------------------
    # info dicts (reference: get_tree_parameters / get_local_information /
    # get_distributed_information, hmatrix.hpp:50-54)
    def get_tree_parameters(self) -> dict:
        return {
            "Epsilon": str(self.epsilon),
            "Eta": str(self.eta),
            "Symmetry": self.symmetry,
            "UPLO": self.UPLO,
            "Minimal_target_depth": str(self.plan.minimal_target_depth),
            "Minimal_source_depth": str(self.plan.minimal_source_depth),
            "Number_of_rows": str(self.plan.nb_rows),
            "Number_of_columns": str(self.plan.nb_cols),
        }

    def _storage_counts(self):
        nt, ns = self.shape
        dense_entries = 0
        for b in self.plan.dense_buckets:
            dense_entries += int(np.sum(b.t_sz.astype(np.int64) * b.s_sz))
            dense_entries += int(np.sum(
                (b.t_sz.astype(np.int64) * b.s_sz) * b.mirror))
        lr_entries = 0
        ranks_all = []
        for b, r in zip(self.plan.lowrank_buckets, self._lr_ranks):
            e = r.astype(np.int64) * (b.t_sz + b.s_sz)
            lr_entries += int(np.sum(e * (1 + b.mirror.astype(np.int64))))
            ranks_all.append(r)
        ranks_all = (np.concatenate(ranks_all) if ranks_all
                     else np.zeros(0, np.int64))
        return dense_entries, lr_entries, ranks_all

    def get_local_information(self) -> dict:
        nt, ns = self.shape
        dense_e, lr_e, ranks = self._storage_counts()
        total = max(nt * ns, 1)
        stored = dense_e + lr_e
        info = {
            "Number_of_rows": str(nt),
            "Number_of_columns": str(ns),
            "Number_of_dense_blocks": str(self.plan.nb_dense_blocks()),
            "Number_of_low_rank_blocks": str(self.plan.nb_lowrank_blocks()),
            "Compression_ratio": str(total / max(stored, 1)),
            "Space_saving": str(1.0 - stored / total),
            "Storage_size_in_bytes": str(stored * self.dtype.itemsize),
            "Min_rank": str(int(ranks.min()) if len(ranks) else 0),
            "Max_rank": str(int(ranks.max()) if len(ranks) else 0),
            "Mean_rank": str(float(ranks.mean()) if len(ranks) else 0.0),
        }
        return info

    def _information_tuple(self):
        """Numeric stats reduced by get_distributed_information:
        (rows, cols, dense_blocks, lr_blocks, stored_entries, bytes,
        min_rank, max_rank, rank_sum, rank_count)."""
        nt, ns = self.shape
        dense_e, lr_e, ranks = self._storage_counts()
        stored = dense_e + lr_e
        return np.array([
            nt, ns, self.plan.nb_dense_blocks(), self.plan.nb_lowrank_blocks(),
            stored, stored * self.dtype.itemsize,
            int(ranks.min()) if len(ranks) else np.iinfo(np.int64).max,
            int(ranks.max()) if len(ranks) else 0,
            int(ranks.sum()) if len(ranks) else 0, len(ranks),
        ], dtype=np.int64)

    def get_distributed_information(self, comm=None) -> dict:
        """Stats reduced across the distributed pieces of the operator —
        the mesh/multi-host analog of the reference's MPI-reduced
        `get_distributed_information(comm)` (hmatrix.hpp:52-54).

        Under `jax.distributed` (process_count > 1) each process passes its
        local block-row H-matrix, exactly like each MPI rank does in the
        reference; the numeric stats are allgather-reduced over processes.
        Single-process SPMD callers holding ALL partitions should reduce
        over them via `reduce_hmatrix_information` (used by
        `DistributedOperator.get_distributed_information`)."""
        import jax

        tup = self._information_tuple()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            all_tups = np.asarray(
                multihost_utils.process_allgather(jnp.asarray(tup)))
            info = _reduced_info_dict(list(all_tups))
        else:
            info = _reduced_info_dict([tup])
        info["Number_of_partitions"] = str(
            len(self.plan.target_root.tree.partition))
        return info

    # low-rank leaf access (for plotting / recompression); returns the
    # user-facing (U (nb, pt, r), V (nb, r, ps)) layout (storage is
    # rank-major Ut, see ops/matvec.py pack_bucket_data)
    def lowrank_leaves(self):
        out = []
        for (Ut, V, *_), b, r in zip(self._assembly_data()["lr"],
                                     self.plan.lowrank_buckets,
                                     self._lr_ranks):
            out.append((to_host(Ut).transpose(0, 2, 1), to_host(V),
                        b, r))
        return out

    def _set_lr_structure(self, lowrank_buckets, lr_arrays, lr_ranks):
        """Replace the low-rank buckets AND factors (recompression with
        rank re-classing: recompressed ranks fall below their assembly
        class, so re-bucketing trims the padded bytes products stream)."""
        import dataclasses
        dense_arrays = [d[0] for d in self._assembly_data()["dense"]]
        self.plan = dataclasses.replace(self.plan,
                                        lowrank_buckets=list(lowrank_buckets))
        self._data = pack_bucket_data(
            self.plan.dense_buckets, dense_arrays,
            self.plan.lowrank_buckets, lr_arrays)
        self._lr_ranks = [np.asarray(r) for r in lr_ranks]
        self._planes_cache = None  # stale product-layout caches
        self._aligned_cache = None

    def _set_lr_arrays(self, lr_arrays, lr_ranks):
        """Replace low-rank factors in place (recompression support)."""
        self._data = pack_bucket_data(
            self.plan.dense_buckets,
            [d[0] for d in self._assembly_data()["dense"]],
            self.plan.lowrank_buckets, lr_arrays)
        self._lr_ranks = [np.asarray(r) for r in lr_ranks]
        self._planes_cache = None  # stale product-layout caches
        self._aligned_cache = None


class HMatrixTreeBuilder:
    """Drives block-tree construction + compression (reference:
    hmatrix_tree_builder.hpp:10-44)."""

    def __init__(self, epsilon: float, eta: float, symmetry: str = "N",
                 UPLO: str = "N", reqrank: int = -1, low_rank_strategy=None):
        if symmetry not in ("N", "S", "H"):
            raise ValueError("symmetry must be 'N', 'S' or 'H'")
        if UPLO not in ("N", "L", "U"):
            raise ValueError("UPLO must be 'N', 'L' or 'U'")
        if symmetry in ("S", "H") and UPLO == "N":
            raise ValueError("symmetric/hermitian requires UPLO 'L' or 'U'")
        self.epsilon = float(epsilon)
        self.eta = float(eta)
        self.symmetry = symmetry
        self.UPLO = UPLO
        self.reqrank = int(reqrank)
        # reference semantics (hmatrix_tree_builder.hpp:23-32):
        # `low_rank_strategy` is a VirtualLowRankGenerator handed in at
        # construction — the ctor-argument spelling of
        # set_low_rank_generator, NOT a strategy-name string
        self.low_rank_strategy = low_rank_strategy
        if low_rank_strategy is not None and not hasattr(
                low_rank_strategy, "build_low_rank_approximation"):
            raise TypeError(
                "low_rank_strategy must be a VirtualLowRankGenerator "
                "(reference: hmatrix_tree_builder.hpp:23-32); got "
                f"{type(low_rank_strategy).__name__}")
        self._low_rank_generator = low_rank_strategy
        self._dense_blocks_generator = None
        self._minimal_target_depth = 0
        self._minimal_source_depth = 0
        self._block_tree_consistency = True
        self._dtype = None

    def set_low_rank_generator(self, gen):
        self._low_rank_generator = gen

    def set_dense_blocks_generator(self, gen):
        self._dense_blocks_generator = gen

    def set_minimal_target_depth(self, d: int):
        self._minimal_target_depth = int(d)

    def set_minimal_source_depth(self, d: int):
        self._minimal_source_depth = int(d)

    def set_block_tree_consistency(self, flag: bool):
        if not flag:
            from ..utils.logger import get_logger
            get_logger().warning(
                "set_block_tree_consistency(False) has no effect: flat "
                "bucketed plans are always built consistently here")
        self._block_tree_consistency = bool(flag)

    def set_dtype(self, dtype):
        self._dtype = dtype

    def build(self, generator, target_cluster: Cluster, source_cluster: Cluster,
              target_partition_number: int = -1,
              partition_number_for_symmetry: int = -1) -> HMatrix:
        t_node = target_cluster
        if target_partition_number >= 0:
            t_node = target_cluster.get_cluster_on_partition(
                target_partition_number)
        # symmetric structure applies when target and source coincide, or —
        # with partition_number_for_symmetry (reference:
        # hmatrix_tree_builder.hpp:36) — on the partition-diagonal sub-block
        # of a block-row build
        sym = self.symmetry
        uplo = self.UPLO
        sym_partition_diag = False

        def _trees_coincide(a, b):
            # the reference workflow builds target and source clusters with
            # separate create_cluster_tree calls on the same points
            # (example/use_hmatrix.py:31-36); structural identity is what
            # symmetric storage actually requires
            return a is b or (
                a.nb_nodes == b.nb_nodes
                and np.array_equal(a.permutation, b.permutation)
                and np.array_equal(a.offsets, b.offsets)
                and np.array_equal(a.sizes, b.sizes))

        same_tree = _trees_coincide(t_node.tree, source_cluster.tree)
        if not same_tree or t_node.node != source_cluster.node:
            if (sym != "N" and partition_number_for_symmetry >= 0
                    and same_tree):
                if (target_partition_number >= 0
                        and partition_number_for_symmetry
                        != target_partition_number):
                    raise ValueError(
                        "partition_number_for_symmetry must match "
                        "target_partition_number")
                sym_partition_diag = True
            else:
                if sym != "N":
                    from ..utils.logger import get_logger
                    get_logger().warning(
                        "symmetric build of a non-diagonal sub-block without "
                        "partition_number_for_symmetry: falling back to "
                        "unsymmetric ('N') storage")
                sym, uplo = "N", "N"
        plan = build_block_plan(
            t_node, source_cluster, self.eta, sym, uplo,
            self._minimal_target_depth, self._minimal_source_depth,
            target_root=Cluster(target_cluster.tree, 0),
            source_root=Cluster(source_cluster.tree, 0),
            symmetric_partition_diag=sym_partition_diag,
        )
        dtype = self._dtype
        if dtype is None:
            dtype = get_config().default_dtype(
                getattr(generator, "is_complex", False))
        new_plan, dense_arrays, lr_arrays, lr_ranks = assemble(
            plan, generator, self.epsilon, self.reqrank,
            self._low_rank_generator, self._dense_blocks_generator, dtype)
        h = HMatrix(new_plan, dense_arrays, lr_arrays, lr_ranks,
                    self.epsilon, dtype)
        # both default compression paths (device ACA/SVD + host SVD) end
        # in an SVD-based truncation, so every leaf is an SVD triple and
        # recompression may take the O(stored bytes) fast path; custom
        # low-rank hooks produce factors of unknown form
        h._lr_svd_form = self._low_rank_generator is None
        return h
