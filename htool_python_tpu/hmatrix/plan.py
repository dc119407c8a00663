"""Block-tree planning: eta-admissibility descent + shape bucketing.

TPU-native replacement for the reference's pointer-based H-matrix block tree
(reference core `HMatrixTreeBuilder`, evidenced at
src/htool/hmatrix/hmatrix_tree_builder.hpp:7-44).  Instead of a tree of
C++ objects, the plan is a flat list of leaf blocks
(t_offset, t_size, s_offset, s_size, mirror) computed once on host, then
grouped into *buckets* of identical padded shape so that assembly,
compression and matvec run as batched device ops (vmap / batched GEMM).

Admissibility (Htool-style center-distance condition):
    min(diam_t, diam_s) <= eta * dist(c_t, c_s)
The reference's exact default condition lives in the non-vendored core
[unverified, see SURVEY.md §2.2]; its tests only pin that the result meets
epsilon in operator norm, which holds for any admissibility choice here
because compression ranks adapt to epsilon (with a dense fallback when a
block is admissible but not worth compressing).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..clustering.cluster import Cluster
from ..config import get_config


def _pad_dim(n: int) -> int:
    """Round a block dimension up to the bucket grid: powers of two up to
    64, multiples of 64 above.

    Cluster subtree sizes are arbitrary (N/2^k is almost never a power of
    two), so a pure pow2 grid pads up to 2x PER DIMENSION — round 2's
    bench stored 2.35x the compressed entries and the matvec streams that
    padding.  A 64-multiple grid caps dimension padding at ~1.2x while
    64 stays coarse enough to keep the bucket-shape count (= compiled
    program count) small."""
    cfg = get_config()
    p = max(cfg.min_bucket_dim, 1)
    while p < n and p < 64:
        p *= 2
    if n <= p:
        return p
    return -(-n // 64) * 64


@dataclasses.dataclass
class Bucket:
    """A group of equally-padded blocks (one batched device array each)."""

    pt: int  # padded target size
    ps: int  # padded source size
    t_off: np.ndarray  # (nb,) int32, offsets RELATIVE to the plan's target root
    s_off: np.ndarray  # (nb,)
    t_sz: np.ndarray  # (nb,) actual sizes
    s_sz: np.ndarray  # (nb,)
    mirror: np.ndarray  # (nb,) bool — add transposed contribution (symmetry)

    @property
    def nb(self) -> int:
        return len(self.t_off)


@dataclasses.dataclass
class BlockPlan:
    """Flat leaf-block lists for one H-matrix (sub)build."""

    target_cluster: Cluster  # root node of the target side of this build
    source_cluster: Cluster
    # root of the *full* trees (for permutations)
    target_root: Cluster
    source_root: Cluster
    eta: float
    symmetry: str  # 'N' | 'S' | 'H'
    UPLO: str
    dense_buckets: list  # list[Bucket]
    lowrank_buckets: list  # list[Bucket]
    minimal_target_depth: int = 0
    minimal_source_depth: int = 0
    # symmetric block-row plans (partition_number_for_symmetry builds,
    # reference: hmatrix_tree_builder.hpp:36) store t_off in ABSOLUTE
    # internal coordinates (not relative to target_offset) so that the
    # partition-diagonal mirror blocks gather/scatter consistently with the
    # global s_off numbering
    t_off_absolute: bool = False

    @property
    def nb_rows(self) -> int:
        return self.target_cluster.get_size()

    @property
    def nb_cols(self) -> int:
        return self.source_cluster.get_size()

    @property
    def target_offset(self) -> int:
        return self.target_cluster.get_offset()

    @property
    def source_offset(self) -> int:
        return self.source_cluster.get_offset()

    def nb_dense_blocks(self) -> int:
        return sum(b.nb for b in self.dense_buckets)

    def nb_lowrank_blocks(self) -> int:
        return sum(b.nb for b in self.lowrank_buckets)


def _admissible(tt, t, ss, s, eta):
    ct, cs = tt.centers[t], ss.centers[s]
    rt, rs = tt.radii[t], ss.radii[s]
    dist = float(np.linalg.norm(ct - cs))
    return 2.0 * min(rt, rs) <= eta * dist


def build_block_plan(
    target_cluster: Cluster,
    source_cluster: Cluster,
    eta: float,
    symmetry: str = "N",
    UPLO: str = "N",
    minimal_target_depth: int = 0,
    minimal_source_depth: int = 0,
    target_root: Cluster | None = None,
    source_root: Cluster | None = None,
    symmetric_partition_diag: bool = False,
) -> BlockPlan:
    """eta-admissibility descent from (target_cluster, source_cluster).

    With symmetry 'S'/'H' only one triangle is planned (per UPLO); each kept
    strictly-off-diagonal leaf is flagged mirror=True, meaning its transposed
    (conjugated for 'H') contribution is added during products/densify.

    symmetric_partition_diag=True is the block-row build of a symmetric
    operator (reference `partition_number_for_symmetry`,
    src/htool/hmatrix/hmatrix_tree_builder.hpp:36): target_cluster is a
    partition node of the SAME tree as source_cluster (the root); the
    partition-diagonal sub-block keeps one triangle + mirror flags while
    the off-diagonal column blocks are planned unsymmetric — the block row
    stays locally complete (its products need no other partition's data,
    the reference's per-rank MPI model).  Such plans store t_off in
    ABSOLUTE coordinates (BlockPlan.t_off_absolute).
    """
    tt, ss = target_cluster.tree, source_cluster.tree
    t_base = target_cluster.get_offset()
    s_base = source_cluster.get_offset()
    sym = symmetry in ("S", "H")
    max_block = get_config().max_block_size

    dense: list[tuple] = []
    lowrank: list[tuple] = []

    # stack entries: (t_node, s_node, symmetric_diagonal, mirror)
    if symmetric_partition_diag and sym:
        if tt is not ss:
            raise ValueError("symmetric_partition_diag requires target and "
                             "source from the same cluster tree")
        # descend the source side until it reaches the partition node; the
        # siblings passed on the way are the unsymmetric off-diagonal column
        # blocks of this block row
        t = target_cluster.node
        t_lo = int(tt.offsets[t])
        t_hi = t_lo + int(tt.sizes[t])
        stack = []
        s = source_cluster.node
        while s != t:
            nxt = None
            for c in ss.children_of(s):
                c_lo = int(ss.offsets[c])
                c_hi = c_lo + int(ss.sizes[c])
                if c_lo <= t_lo and c_hi >= t_hi:
                    nxt = c
                else:
                    stack.append((t, c, False, False))
            if nxt is None:
                raise ValueError(
                    "target partition node is not reachable from the source "
                    "root (malformed cluster tree)")
            s = nxt
        stack.append((t, t, True, False))
        t_base = 0  # absolute t offsets
    else:
        symmetric_partition_diag = False
        stack = [(target_cluster.node, source_cluster.node, sym, False)]
    while stack:
        t, s, on_diag, mirror = stack.pop()
        t_sz, s_sz = int(tt.sizes[t]), int(ss.sizes[s])
        t_off, s_off = int(tt.offsets[t]) - t_base, int(ss.offsets[s]) - s_base
        if t_sz == 0 or s_sz == 0:
            continue
        t_leaf, s_leaf = tt.is_leaf(t), ss.is_leaf(s)
        deep_enough = (tt.depths[t] >= minimal_target_depth
                       and ss.depths[s] >= minimal_source_depth)

        # uniform tile cap: keep splitting admissible blocks above
        # max_block_size (bounded rank per block => reliable ACA, few
        # distinct padded shapes => few XLA compiles, large batches)
        small_enough = (max(t_sz, s_sz) <= max_block
                        or (t_leaf and s_leaf))
        if (not on_diag) and deep_enough and small_enough \
                and _admissible(tt, t, ss, s, eta):
            lowrank.append((t_off, t_sz, s_off, s_sz, mirror))
            continue
        if t_leaf and s_leaf:
            dense.append((t_off, t_sz, s_off, s_sz, mirror))
            continue

        # descend: split both when possible, else the non-leaf side
        t_children = list(tt.children_of(t)) if not t_leaf else [t]
        s_children = list(ss.children_of(s)) if not s_leaf else [s]
        if on_diag:
            # t and s are the same node of the same tree here
            for i, tc in enumerate(t_children):
                for j, sc in enumerate(s_children):
                    if i == j:
                        stack.append((tc, sc, True, False))
                    elif (UPLO == "L" and i > j) or (UPLO == "U" and i < j):
                        stack.append((tc, sc, False, True))
                    # the other triangle is the mirror — skipped
        else:
            for tc in t_children:
                for sc in s_children:
                    stack.append((tc, sc, False, mirror))

    return BlockPlan(
        target_cluster=target_cluster,
        source_cluster=source_cluster,
        target_root=target_root or Cluster(tt, 0),
        source_root=source_root or Cluster(ss, 0),
        eta=eta,
        symmetry=symmetry,
        UPLO=UPLO,
        dense_buckets=_bucketize(dense),
        lowrank_buckets=_bucketize(lowrank),
        minimal_target_depth=minimal_target_depth,
        minimal_source_depth=minimal_source_depth,
        t_off_absolute=symmetric_partition_diag,
    )


def _bucketize(blocks: list[tuple]) -> list[Bucket]:
    """Group (t_off, t_sz, s_off, s_sz, mirror) tuples by padded shape."""
    groups: dict[tuple[int, int], list[tuple]] = {}
    for blk in blocks:
        key = (_pad_dim(blk[1]), _pad_dim(blk[3]))
        groups.setdefault(key, []).append(blk)
    buckets = []
    for (pt, ps), blks in sorted(groups.items()):
        arr = np.asarray(blks, dtype=np.int64)
        buckets.append(Bucket(
            pt=pt, ps=ps,
            t_off=arr[:, 0].astype(np.int32),
            t_sz=arr[:, 1].astype(np.int32),
            s_off=arr[:, 2].astype(np.int32),
            s_sz=arr[:, 3].astype(np.int32),
            mirror=arr[:, 4].astype(bool),
        ))
    return buckets
