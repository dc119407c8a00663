"""Test/benchmark geometries: random point clouds, optionally pre-partitioned.

Functional equivalents of the reference's example geometry helpers
(example/create_geometry.py): uniform points in a disk / ball, shifted
source clouds, and per-partition shifted clusters with a (2, P)
offset/size partition table.
"""

from __future__ import annotations

import numpy as np


def create_random_points_in_disk(nb_points: int, rng=None) -> np.ndarray:
    rng = np.random if rng is None else rng
    r = np.sqrt(rng.rand(nb_points))
    theta = 2 * np.pi * rng.rand(nb_points)
    return np.stack([r * np.cos(theta), r * np.sin(theta)])


def create_random_points_in_sphere(nb_points: int, rng=None) -> np.ndarray:
    rng = np.random if rng is None else rng
    r = np.cbrt(rng.rand(nb_points))
    costh = 2 * rng.rand(nb_points) - 1
    sinth = np.sqrt(1 - costh**2)
    phi = 2 * np.pi * rng.rand(nb_points)
    return np.stack([r * sinth * np.cos(phi), r * sinth * np.sin(phi),
                     r * costh])


def create_random_geometries(dimension: int, nb_rows: int, nb_cols: int,
                             seed: int = 0):
    """Two disjoint clouds; the source cloud shifted along x."""
    np.random.seed(seed)
    maker = (create_random_points_in_disk if dimension == 2
             else create_random_points_in_sphere)
    target = maker(nb_rows)
    source = maker(nb_cols)
    source[0, :] += 2.0
    return [target, source]


def create_partitioned_geometries(dimension: int, nb_rows: int, nb_cols: int,
                                  nb_partitions: int, seed: int = 0):
    """Target cloud laid out as `nb_partitions` shifted clusters, with the
    (2, P) offset/size table describing the contiguous user-numbering
    partition (the reference's `create_partitionned_geometries` shape)."""
    np.random.seed(seed)
    maker = (create_random_points_in_disk if dimension == 2
             else create_random_points_in_sphere)
    local = nb_rows // nb_partitions
    partition = np.zeros((2, nb_partitions), dtype=np.int64)
    parts = []
    for p in range(nb_partitions):
        size = local if p < nb_partitions - 1 else nb_rows - local * (
            nb_partitions - 1)
        partition[0, p] = p * local
        partition[1, p] = size
        pts = maker(size)
        pts[0, :] += 3.0 * p
        parts.append(pts)
    target = np.concatenate(parts, axis=1)
    source = maker(nb_cols)
    source[0, :] += 3.0 * (nb_partitions - 1) / 2.0
    source[1, :] += 3.0
    return [target, source, partition]


def create_random_points_on_sphere(nb_points: int, rng=None) -> np.ndarray:
    """Uniform points on the unit sphere SURFACE (a 2-D manifold in 3-D) —
    the BEM-style geometry H-matrix solvers target: off-diagonal ranks of
    smooth kernels stay moderate at scale, unlike volume clouds."""
    rng = np.random if rng is None else rng
    g = rng.randn(3, nb_points) if hasattr(rng, "randn") else \
        rng.standard_normal((3, nb_points))
    return g / np.linalg.norm(g, axis=0, keepdims=True)
