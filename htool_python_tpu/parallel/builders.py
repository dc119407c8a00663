"""One-call distributed-operator assembly builders.

Reference parity (src/htool/distributed_operator/utility.hpp:11-43):
  * `DefaultApproximationBuilder` — each partition gets the H-matrix block
    row of its target-partition rows × ALL source columns, registered as a
    global-to-local operator; exposes `.distributed_operator`, `.hmatrix`,
    `.block_diagonal_hmatrix`.
  * `DefaultLocalApproximationBuilder` — only the partition-diagonal block
    is compressed; off-diagonal operators are added by the user.
  * `CustomApproximationBuilder` — fully user-provided local operators.

SPMD note: the reference runs one MPI process per partition, so
`.hmatrix` is "this rank's block".  Here one process holds every
partition; the same attributes return a `PerPartition` container (a list
that, when it has a single element, forwards attribute access to it so
1-partition code reads identically to the reference).
"""

from __future__ import annotations

import numpy as np

from ..clustering.cluster import Cluster
from ..hmatrix.hmatrix import HMatrixTreeBuilder
from .distributed_operator import DistributedOperator
from .local_operator import LocalHMatrix, LocalRenumbering


class PerPartition(list):
    """Per-partition container with single-element attribute forwarding."""

    def __getattr__(self, name):
        if len(self) == 1:
            return getattr(self[0], name)
        raise AttributeError(
            f"PerPartition has {len(self)} elements; index it explicitly "
            f"(e.g. obj[p].{name})")

    def __deepcopy__(self, memo):
        import copy
        return PerPartition(copy.deepcopy(item, memo) for item in self)


class DefaultApproximationBuilder:
    def __init__(self, generator, target_cluster: Cluster,
                 source_cluster: Cluster, hmatrix_builder: HMatrixTreeBuilder,
                 comm=None):
        import time as _time

        self.distributed_operator = DistributedOperator(
            target_cluster, source_cluster, comm)
        P = self.distributed_operator.n_partitions
        hmatrices = []
        src_renum = LocalRenumbering(0, source_cluster.get_size(),
                                     source_cluster.get_permutation())
        sym_p = -1 if hmatrix_builder.symmetry == "N" else 0
        self.build_profile = {"block_row_s": []}
        for p in range(P):
            # symmetric operators: the partition-diagonal sub-block of each
            # block row keeps one triangle + mirrors (reference passes the
            # rank as partition_number_for_symmetry, utility.hpp:26-32)
            t0 = _time.perf_counter()
            h = hmatrix_builder.build(
                generator, target_cluster, source_cluster,
                target_partition_number=p,
                partition_number_for_symmetry=(p if sym_p >= 0 else -1))
            self.build_profile["block_row_s"].append(
                round(_time.perf_counter() - t0, 3))
            hmatrices.append(h)
            op = LocalHMatrix(h)
            # block row: source window = the full source range
            op.local_source_renumbering = src_renum
            self.distributed_operator.add_global_to_local_operator(op, p)
        self.hmatrix = PerPartition(hmatrices)
        self._clusters = (target_cluster, source_cluster)
        self._block_diag = None

    @property
    def block_diagonal_hmatrix(self):
        """Partition-diagonal sub-blocks, extracted LAZILY on first access:
        the extraction pulls every block row's data to host (slow over the
        remote TPU link) and only solver setups need it — a distributed
        matvec workflow should not pay for it (r04 weak: distributed build
        3.2x the single-partition assembly)."""
        if self._block_diag is None:
            import time as _time
            t0 = _time.perf_counter()
            tc, sc = self._clusters
            self._block_diag = PerPartition(
                _extract_block_diagonal(h, tc, sc, p)
                for p, h in enumerate(self.hmatrix))
            self.build_profile["extract_block_diag_s"] = round(
                _time.perf_counter() - t0, 3)
        return self._block_diag

    @block_diagonal_hmatrix.setter
    def block_diagonal_hmatrix(self, value):
        self._block_diag = value


class DefaultLocalApproximationBuilder:
    def __init__(self, generator, target_cluster: Cluster,
                 source_cluster: Cluster, hmatrix_builder: HMatrixTreeBuilder,
                 comm=None):
        self.distributed_operator = DistributedOperator(
            target_cluster, source_cluster, comm)
        P = self.distributed_operator.n_partitions
        hmatrices = []
        for p in range(P):
            s_node = source_cluster.get_cluster_on_partition(p)
            h = _build_sub_block(hmatrix_builder, generator, target_cluster,
                                 source_cluster, p)
            hmatrices.append(h)
            op = LocalHMatrix(h)
            op.local_source_renumbering = LocalRenumbering(s_node)
            self.distributed_operator.add_global_to_local_operator(op, p)
        self.hmatrix = PerPartition(hmatrices)
        self.block_diagonal_hmatrix = self.hmatrix


class CustomApproximationBuilder:
    def __init__(self, target_cluster: Cluster, source_cluster: Cluster,
                 comm=None, local_operator=None):
        self.distributed_operator = DistributedOperator(
            target_cluster, source_cluster, comm)
        if local_operator is not None:
            ops = (local_operator if isinstance(local_operator, (list, tuple))
                   else [local_operator])
            for op in ops:
                # the reference accepts either operator kind here
                # (distributed_operator/utility.hpp:35): dispatch on the
                # interface the object implements
                if hasattr(op, "local_add_vector_product"):
                    self.distributed_operator.add_local_to_local_operator(op)
                else:
                    self.distributed_operator.add_global_to_local_operator(op)


def _build_sub_block(hmatrix_builder: HMatrixTreeBuilder, generator,
                     target_cluster: Cluster, source_cluster: Cluster,
                     p: int):
    """Build the (target partition p) x (source partition p) diagonal block."""
    t_node = target_cluster.get_cluster_on_partition(p)
    s_node = source_cluster.get_cluster_on_partition(p)
    sub_builder = HMatrixTreeBuilder(
        hmatrix_builder.epsilon, hmatrix_builder.eta,
        hmatrix_builder.symmetry, hmatrix_builder.UPLO,
        hmatrix_builder.reqrank)
    sub_builder._low_rank_generator = hmatrix_builder._low_rank_generator
    sub_builder._dtype = hmatrix_builder._dtype
    return sub_builder.build(generator, t_node, s_node)


def _extract_block_diagonal(hmatrix, target_cluster, source_cluster, p):
    """The diagonal sub-block of a block-row H-matrix, as its own HMatrix.

    Reference parity: `DefaultApproximationBuilder.block_diagonal_hmatrix`
    (utility.hpp:30-32).  Blocks of the row plan fully inside the source
    partition's column range are reused (device arrays shared); straddling
    blocks are clipped by re-masking.
    """
    import dataclasses

    import jax.numpy as jnp

    from ..hmatrix.hmatrix import HMatrix
    from ..hmatrix.plan import BlockPlan, _bucketize

    t_node = target_cluster.get_cluster_on_partition(p)
    if source_cluster.nb_partitions() > p:
        s_node = source_cluster.get_cluster_on_partition(p)
    else:
        # unpartitioned source cluster (reference workflow: source built
        # without size_of_partition, example/use_distributed_operator.py):
        # the "diagonal" block spans all source columns
        s_node = source_cluster
    s_lo = s_node.get_offset() - hmatrix.plan.source_offset
    s_hi = s_lo + s_node.get_size()
    # symmetric block-row plans carry absolute t offsets; the extracted
    # diagonal block is a standard local plan (both offsets partition-local)
    tb = hmatrix.plan.target_offset if hmatrix.plan.t_off_absolute else 0

    dense_tuples, dense_mats = [], []
    for (D, *_), b in zip(hmatrix._data["dense"], hmatrix.plan.dense_buckets):
        Dh = None
        for i in range(b.nb):
            lo, hi = int(b.s_off[i]), int(b.s_off[i]) + int(b.s_sz[i])
            clo, chi = max(lo, s_lo), min(hi, s_hi)
            if chi <= clo:
                continue
            if Dh is None:
                Dh = np.asarray(D)
            blk = Dh[i, :b.t_sz[i], clo - lo:chi - lo]
            dense_tuples.append((int(b.t_off[i]) - tb, int(b.t_sz[i]),
                                 clo - s_lo, chi - clo, bool(b.mirror[i])))
            dense_mats.append(blk)
    lr_tuples, lr_mats = [], []
    for (Ut, V, *_), b, ranks in zip(hmatrix._data["lr"],
                                     hmatrix.plan.lowrank_buckets,
                                     hmatrix._lr_ranks):
        Uh = Vh = None
        for i in range(b.nb):
            lo, hi = int(b.s_off[i]), int(b.s_off[i]) + int(b.s_sz[i])
            clo, chi = max(lo, s_lo), min(hi, s_hi)
            if chi <= clo:
                continue
            if Uh is None:
                # stored rank-major Ut (nb, r, pt) -> slice back to (pt, r)
                Uh, Vh = np.asarray(Ut), np.asarray(V)
            r = int(ranks[i])
            lr_tuples.append((int(b.t_off[i]) - tb, int(b.t_sz[i]),
                              clo - s_lo, chi - clo, bool(b.mirror[i]), r))
            lr_mats.append((Uh[i, :r, :b.t_sz[i]].T,
                            Vh[i, :r, clo - lo:chi - lo]))

    dense_buckets = _bucketize([t[:5] for t in dense_tuples])
    # re-pack arrays following the bucketization order
    key_of = {}
    for t, m in zip(dense_tuples, dense_mats):
        key_of.setdefault(t[:5], []).append(m)
    dense_arrays = []
    for b in dense_buckets:
        Dn = np.zeros((b.nb, b.pt, b.ps), dtype=hmatrix.dtype)
        for i in range(b.nb):
            key = (b.t_off[i], b.t_sz[i], b.s_off[i], b.s_sz[i],
                   bool(b.mirror[i]))
            m = key_of[key].pop(0)
            Dn[i, :m.shape[0], :m.shape[1]] = m
        dense_arrays.append(jnp.asarray(Dn))

    lr_buckets = _bucketize([t[:5] for t in lr_tuples])
    lkey_of = {}
    for t, m in zip(lr_tuples, lr_mats):
        lkey_of.setdefault(t[:5], []).append((m, t[5]))
    lr_arrays, lr_ranks = [], []
    for b in lr_buckets:
        rmax = 1
        items = []
        for i in range(b.nb):
            key = (b.t_off[i], b.t_sz[i], b.s_off[i], b.s_sz[i],
                   bool(b.mirror[i]))
            (u, v), r = lkey_of[key].pop(0)
            items.append((u, v, r))
            rmax = max(rmax, r)
        Un = np.zeros((b.nb, b.pt, rmax), dtype=hmatrix.dtype)
        Vn = np.zeros((b.nb, rmax, b.ps), dtype=hmatrix.dtype)
        rk = np.zeros(b.nb, dtype=np.int32)
        for i, (u, v, r) in enumerate(items):
            Un[i, :u.shape[0], :r] = u
            Vn[i, :r, :v.shape[1]] = v
            rk[i] = r
        lr_arrays.append((jnp.asarray(Un), jnp.asarray(Vn)))
        lr_ranks.append(rk)

    plan = BlockPlan(
        target_cluster=t_node, source_cluster=s_node,
        target_root=hmatrix.plan.target_root,
        source_root=hmatrix.plan.source_root,
        eta=hmatrix.eta, symmetry=hmatrix.symmetry, UPLO=hmatrix.UPLO,
        dense_buckets=dense_buckets, lowrank_buckets=lr_buckets)
    return HMatrix(plan, dense_arrays, lr_arrays, lr_ranks,
                   hmatrix.epsilon, hmatrix.dtype)
