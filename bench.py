"""Headline benchmark: H-matrix assembly + compressed matvec on one chip.

Config 1 of BASELINE.json (`use_hmatrix.py`-style): 3-D random cloud,
1/(0.1+r) kernel, eps = 1e-3, device (TPU) assembly via batched ACA and
bucketed gather-GEMM-scatter matvec in f32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against a conservative reference-class CPU estimate of compressed
matvec throughput (2 GB/s effective through compressed storage ~ 2.5e8
compressed entries/s for f64 BLAS2-bound traversal on one core-complex,
the reference's per-process execution model).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from htool_python_tpu.clustering.cluster import ClusterTreeBuilder
    from htool_python_tpu.hmatrix.generator import KernelGenerator
    from htool_python_tpu.hmatrix.hmatrix import HMatrixTreeBuilder
    from htool_python_tpu.models.geometry import create_random_points_in_sphere
    from htool_python_tpu.models.kernels import inverse_distance_kernel

    N = int(os.environ.get("BENCH_N", 40000))
    eps = 1e-3
    np.random.seed(0)
    points = create_random_points_in_sphere(N)

    t0 = time.perf_counter()
    cb = ClusterTreeBuilder()
    cb.set_maximal_leaf_size(128)
    cluster = cb.create_cluster_tree(points, 2)
    t_cluster = time.perf_counter() - t0

    gen = KernelGenerator(inverse_distance_kernel(1e-1), points, points)
    hb = HMatrixTreeBuilder(eps, 10.0, "N", "N")
    hb.set_dtype(np.float32)
    t0 = time.perf_counter()
    hmatrix = hb.build(gen, cluster, cluster)
    t_assembly = time.perf_counter() - t0

    # compressed entry count (actual, unpadded)
    dense_e, lr_e, _ = hmatrix._storage_counts()
    compressed = dense_e + lr_e

    x = np.random.rand(N).astype(np.float32)
    y = hmatrix * x  # warm-up / compile
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        y = hmatrix * x
    t_matvec = (time.perf_counter() - t0) / reps

    # accuracy spot check on a random slice of rows
    rows = np.random.choice(N, 200, replace=False)
    t = points[:, rows]
    d = np.linalg.norm(t[:, :, None] - points[:, None, :], axis=0)
    y_exact = (1.0 / (1e-1 + d)) @ x
    rel = np.linalg.norm(y[rows] - y_exact) / np.linalg.norm(y_exact)

    nnz_per_s = compressed / t_matvec
    baseline_nnz_per_s = 2.5e8  # reference-class single-process CPU estimate
    result = {
        "metric": "hmatrix_compressed_matvec",
        "value": round(nnz_per_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(nnz_per_s / baseline_nnz_per_s, 3),
        "detail": {
            "N": N,
            "epsilon": eps,
            "platform": jax.devices()[0].platform,
            "cluster_time_s": round(t_cluster, 3),
            "assembly_time_s": round(t_assembly, 3),
            "matvec_time_ms": round(t_matvec * 1e3, 3),
            "compressed_entries": int(compressed),
            "compression_ratio": round(N * N / max(compressed, 1), 2),
            "rel_error_sampled": float(rel),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
