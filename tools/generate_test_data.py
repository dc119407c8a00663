"""Golden-data generator for the DDM solver test suite.

Replaces the reference's non-vendored `htool_generate_data_test` submodule
(consumed at reference tests/conftest.py:398-510) with a self-hosted
script writing the SAME binary formats:

  matrix.bin    : uint32 m, uint32 n, complex128 data (A.T C-order, so the
                  loader's `transpose(frombuffer.reshape(m, n))` yields A)
  geometry.bin  : uint32 count, doubles, reshape(3, m, order='F')
  rhs.bin       : uint32 count, complex128
  sol.bin       : uint32 count, complex128
  cluster_{P}_cluster_tree{_properties}.csv : our cluster CSV format
  cluster_to_ovr_subdomain_{P}_{r}.bin, ovr_subdomain_to_global_{P}_{r}.bin,
  neighbors_{P}_{r}.bin, intersections_{P}_{r}_{i}.bin : uint32 count + int32
  Ki_{P}_{r}.bin: uint32 m, uint32 n, complex128 (local Neumann matrix)

Cases: output_sym (real SPD) and output_non_sym (complex non-symmetric),
each diagonally shifted to be well conditioned so that the reference's
accuracy contract (GMRES to 1e-6, solution error < 10 eps vs the dense
solve) is achievable by any correct solver.
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from htool_python_tpu.clustering.cluster import ClusterTreeBuilder  # noqa: E402
from htool_python_tpu.clustering.io import write_cluster_to  # noqa: E402


def _write_array(path, arr):
    arr = np.ascontiguousarray(arr)
    with open(path, "wb") as f:
        f.write(struct.pack("@I", arr.size))
        f.write(arr.tobytes())


def _write_matrix(path, A):
    m, n = A.shape
    with open(path, "wb") as f:
        f.write(struct.pack("@II", m, n))
        # loader does transpose(reshape(m, n)) => write A.T in C order
        f.write(np.ascontiguousarray(A.T.astype(np.complex128)).tobytes())


def _kernel_matrix(points, complex_case):
    d = np.linalg.norm(points[:, :, None] - points[:, None, :], axis=0)
    if complex_case:
        k = 2.0
        with np.errstate(divide="ignore", invalid="ignore"):
            A = np.exp(1j * k * d) / (4 * np.pi * np.maximum(d, 1e-2))
        np.fill_diagonal(A, np.abs(A).max())
        # gentle non-symmetric perturbation
        rng = np.random.RandomState(7)
        A = A + 0.02 * np.abs(A).mean() * (
            rng.rand(*A.shape) + 1j * rng.rand(*A.shape))
    else:
        A = 1.0 / (1e-1 + d)
    # diagonal shift for conditioning (keeps the accuracy contract reachable)
    shift = np.abs(A).sum(axis=1).max()
    A = A + shift * np.eye(A.shape[0], dtype=A.dtype)
    return A


def _overlap_decomposition(points, cluster, n_partitions, n_layers=2):
    """Geometric overlapping subdomains: each partition's dofs plus
    `n_layers` rounds of nearest-neighbor growth (user numbering)."""
    perm = cluster.get_permutation()
    N = points.shape[1]
    # kNN graph on the points
    d = np.linalg.norm(points[:, :, None] - points[:, None, :], axis=0)
    np.fill_diagonal(d, np.inf)
    knn = np.argsort(d, axis=1)[:, :8]

    owners = np.empty(N, dtype=np.int64)
    own_sets = []
    for p in range(n_partitions):
        node = cluster.get_cluster_on_partition(p)
        own = perm[node.get_offset():node.get_offset() + node.get_size()]
        owners[own] = p
        own_sets.append(own)

    subdomains = []
    for p in range(n_partitions):
        own = own_sets[p]
        in_sub = np.zeros(N, dtype=bool)
        in_sub[own] = True
        for _ in range(n_layers):
            frontier = np.unique(knn[in_sub].ravel())
            in_sub[frontier] = True
        ghosts = np.setdiff1d(np.flatnonzero(in_sub), own)
        ovr_to_global = np.concatenate([own, ghosts]).astype(np.int32)
        cluster_to_ovr = np.arange(len(own), dtype=np.int32)
        subdomains.append((ovr_to_global, cluster_to_ovr))

    # neighbors + intersections
    sets = [set(s[0].tolist()) for s in subdomains]
    result = []
    for p in range(n_partitions):
        ovr_to_global, cluster_to_ovr = subdomains[p]
        neighbors, intersections = [], []
        for q in range(n_partitions):
            if q == p:
                continue
            shared = [i for i, g in enumerate(ovr_to_global)
                      if int(g) in sets[q]]
            if shared:
                neighbors.append(q)
                intersections.append(np.asarray(shared, dtype=np.int32))
        result.append((ovr_to_global, cluster_to_ovr,
                       np.asarray(neighbors, dtype=np.int32), intersections))
    return result


def generate_case(out_dir, complex_case, size=400, seed=0,
                  partitions=(1, 2, 3, 4)):
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    # points on a sphere surface-ish cloud (3, m)
    pts = rng.randn(3, size)
    pts /= np.linalg.norm(pts, axis=0, keepdims=True)
    pts += 0.1 * rng.rand(3, size)

    A = _kernel_matrix(pts, complex_case)
    rhs = rng.rand(size) + (1j * rng.rand(size) if complex_case else 0)
    sol = np.linalg.solve(A, rhs)

    _write_matrix(os.path.join(out_dir, "matrix.bin"), A)
    _write_array(os.path.join(out_dir, "geometry.bin"),
                 pts.astype(np.float64).flatten(order="F"))
    _write_array(os.path.join(out_dir, "rhs.bin"), rhs.astype(np.complex128))
    _write_array(os.path.join(out_dir, "sol.bin"), sol.astype(np.complex128))

    for P in partitions:
        builder = ClusterTreeBuilder()
        builder.set_maximal_leaf_size(10)
        cluster = builder.create_cluster_tree(pts, 2, size_of_partition=P)
        write_cluster_to(
            cluster,
            os.path.join(out_dir, f"cluster_{P}_cluster_tree_properties.csv"),
            os.path.join(out_dir, f"cluster_{P}_cluster_tree.csv"))
        decomp = _overlap_decomposition(pts, cluster, P)
        for r, (ovr, c2o, nbr, inters) in enumerate(decomp):
            _write_array(os.path.join(
                out_dir, f"ovr_subdomain_to_global_{P}_{r}.bin"), ovr)
            _write_array(os.path.join(
                out_dir, f"cluster_to_ovr_subdomain_{P}_{r}.bin"), c2o)
            _write_array(os.path.join(out_dir, f"neighbors_{P}_{r}.bin"), nbr)
            for i, inter in enumerate(inters):
                _write_array(os.path.join(
                    out_dir, f"intersections_{P}_{r}_{i}.bin"), inter)
            # local Neumann matrix: principal submatrix (SPD for sym case)
            Ki = A[np.ix_(ovr, ovr)]
            _write_matrix(os.path.join(out_dir, f"Ki_{P}_{r}.bin"), Ki)


def main(base_dir=None):
    base = base_dir or os.path.join(os.path.dirname(__file__), "..", "data",
                                    "htool_generated_data")
    generate_case(os.path.join(base, "output_sym"), complex_case=False)
    generate_case(os.path.join(base, "output_non_sym"), complex_case=True)
    print("golden data written to", os.path.abspath(base))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
