"""Geometric partitioning strategies for cluster-tree construction.

Reference parity: the four policy classes PCARegular / PCAGeometric /
BoundingBoxRegular / BoundingBoxGeometric registered in the reference at
src/htool/clustering/implementation/partitioning.hpp:6-11 and
main.cpp:54-57.  Direction choice = {weighted PCA largest eigenvector,
largest axis-aligned bounding-box extent}; split choice = {regular =
(weight-)balanced cardinality, geometric = equal extent intervals}.

These run on host (numpy) at setup time — they are not device code.
"""

from __future__ import annotations

import numpy as np


class VirtualPartitioning:
    """Abstract base (reference: clustering/interface/virtual_partitioning.hpp)."""

    def compute_direction(self, points: np.ndarray, weights: np.ndarray) -> np.ndarray:
        """Return a unit direction (dim,) along which to split `points` (dim, n)."""
        raise NotImplementedError

    def split(
        self,
        points: np.ndarray,
        weights: np.ndarray,
        indices: np.ndarray,
        nb_children: int,
    ) -> list[np.ndarray]:
        """Split `indices` (into columns of `points`) into <= nb_children parts.

        Returns a list of index arrays (some may be dropped if empty); their
        concatenation must be a permutation of `indices` and each part must be
        contiguous in the returned ordering.
        """
        direction = self.compute_direction(points[:, indices], weights[indices])
        proj = direction @ points[:, indices]
        order = np.argsort(proj, kind="stable")
        sorted_indices = indices[order]
        return self._split_sorted(sorted_indices, proj[order], weights[sorted_indices], nb_children)

    def _split_sorted(self, sorted_indices, sorted_proj, sorted_weights, nb_children):
        raise NotImplementedError


def _pca_direction(points: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Weighted principal direction of a (dim, n) point cloud."""
    w = weights / max(weights.sum(), np.finfo(np.float64).tiny)
    center = points @ w
    centered = points - center[:, None]
    cov = (centered * w) @ centered.T
    # dim is 2 or 3: eigh is exact and cheap
    eigvals, eigvecs = np.linalg.eigh(cov)
    v = eigvecs[:, -1]
    # sign convention (must match native/cluster_builder.cpp largest_eigvec):
    # flip so the largest-magnitude component is positive — eigenvectors are
    # only defined up to sign and a flip reverses the projection sort, so a
    # fixed convention keeps the numpy and native paths producing the same
    # tree on the same inputs.
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    return v


def _bbox_direction(points: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Largest-extent axis of the axis-aligned bounding box."""
    extent = points.max(axis=1) - points.min(axis=1)
    direction = np.zeros(points.shape[0])
    direction[int(np.argmax(extent))] = 1.0
    return direction


def _regular_split(sorted_indices, sorted_proj, sorted_weights, nb_children):
    """Balanced split: children get (nearly) equal total weight."""
    n = len(sorted_indices)
    cum = np.cumsum(sorted_weights)
    total = cum[-1]
    parts = []
    start = 0
    for c in range(nb_children):
        if c == nb_children - 1:
            stop = n
        else:
            # first index where cumulative weight exceeds the c+1 quantile
            stop = int(np.searchsorted(cum, total * (c + 1) / nb_children, side="left")) + 1
            stop = min(max(stop, start), n)
        if stop > start:
            parts.append(sorted_indices[start:stop])
        start = stop
    return parts


def _geometric_split(sorted_indices, sorted_proj, sorted_weights, nb_children):
    """Equal-extent split along the projection axis."""
    lo, hi = sorted_proj[0], sorted_proj[-1]
    if hi <= lo:  # degenerate cloud: fall back to balanced split
        return _regular_split(sorted_indices, sorted_proj, sorted_weights, nb_children)
    edges = lo + (hi - lo) * np.arange(1, nb_children) / nb_children
    cuts = np.searchsorted(sorted_proj, edges, side="left")
    parts = []
    start = 0
    for stop in list(cuts) + [len(sorted_indices)]:
        stop = int(stop)
        if stop > start:
            parts.append(sorted_indices[start:stop])
        start = stop
    return parts


class PCARegular(VirtualPartitioning):
    def compute_direction(self, points, weights):
        return _pca_direction(points, weights)

    def _split_sorted(self, si, sp, sw, k):
        return _regular_split(si, sp, sw, k)


class PCAGeometric(VirtualPartitioning):
    def compute_direction(self, points, weights):
        return _pca_direction(points, weights)

    def _split_sorted(self, si, sp, sw, k):
        return _geometric_split(si, sp, sw, k)


class BoundingBoxRegular(VirtualPartitioning):
    def compute_direction(self, points, weights):
        return _bbox_direction(points, weights)

    def _split_sorted(self, si, sp, sw, k):
        return _regular_split(si, sp, sw, k)


class BoundingBoxGeometric(VirtualPartitioning):
    def compute_direction(self, points, weights):
        return _bbox_direction(points, weights)

    def _split_sorted(self, si, sp, sw, k):
        return _geometric_split(si, sp, sw, k)
