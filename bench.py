"""Headline benchmark: H-matrix assembly + compressed matvec on one chip.

Config 1 of BASELINE.json (`use_hmatrix.py`-style): 3-D random cloud,
1/(0.1+r) kernel, eps = 1e-3, device (TPU) assembly via batched ACA and
Pallas bucketed block-GEMM matvec in f32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is the
speed-of-light fraction: measured effective HBM bandwidth through the
*stored* (padded) compressed data divided by the chip's HBM roofline
(~810 GB/s on v5e; a raw-stream probe on this chip measures ~745 GB/s).

Timing note: the TPU is reached over a tunnel with ~25 ms host<->device
round-trip latency, so per-call host-synced timing measures the link, not
the kernel.  The matvec is therefore timed as a device-resident power
iteration (lax.fori_loop chain) with one readback, differencing two rep
counts to cancel constant dispatch overhead.  The single-call end-to-end
latency (including the tunnel) is reported separately in detail.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HBM_ROOFLINE_GBS = 810.0  # v5e HBM peak; raw probe on this chip: ~745 GB/s


def main():
    import jax
    import jax.numpy as jnp

    from htool_python_tpu.clustering.cluster import ClusterTreeBuilder
    from htool_python_tpu.hmatrix.generator import KernelGenerator
    from htool_python_tpu.hmatrix.hmatrix import HMatrixTreeBuilder
    from htool_python_tpu.models.geometry import create_random_points_in_sphere
    from htool_python_tpu.models.kernels import inverse_distance_kernel
    from htool_python_tpu.ops.matvec import apply_hmatrix_user, resolve_backend

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
    jax.block_until_ready(hmatrix._data)
    t_assembly = time.perf_counter() - t0

    # compressed entry count (actual, unpadded) and stored (padded) bytes
    dense_e, lr_e, _ = hmatrix._storage_counts()
    compressed = dense_e + lr_e
    data = hmatrix._data
    stored_bytes = sum(
        int(np.prod(d[0].shape)) * d[0].dtype.itemsize for d in data["dense"])
    stored_bytes += sum(
        (int(np.prod(u.shape)) + int(np.prod(v.shape))) * u.dtype.itemsize
        for u, v, *_ in data["lr"])

    # ---- device-resident matvec chain (power iteration) ----
    pad_len = hmatrix._pad_len
    perm_in, inv_out = hmatrix._device_perms("N")
    backend = resolve_backend(data, pad_len, 1, np.float32)

    x0 = jnp.asarray(np.random.rand(N, 1).astype(np.float32))

    def chain(reps):
        @jax.jit
        def run(data, x):
            def body(i, x):
                y = apply_hmatrix_user(data, perm_in, inv_out, x, pad_len,
                                       "N", "N", N, backend)
                return y * (1.0 / jnp.linalg.norm(y))
            return jax.lax.fori_loop(0, reps, body, x)
        return run

    run10, run110 = chain(10), chain(110)
    float(run10(data, x0)[0, 0])  # warm-up / compile
    float(run110(data, x0)[0, 0])
    t0 = time.perf_counter()
    float(run10(data, x0)[0, 0])
    t_10 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run110(data, x0)[0, 0])
    t_110 = time.perf_counter() - t0
    t_matvec = max((t_110 - t_10) / 100.0, 1e-9)

    # single-call end-to-end latency (numpy in/out, includes tunnel RTT)
    x_np = np.random.rand(N).astype(np.float32)
    y = hmatrix * x_np
    t0 = time.perf_counter()
    y = hmatrix * x_np
    t_single = time.perf_counter() - t0

    # accuracy spot check on a random slice of rows
    rows = np.random.choice(N, 200, replace=False)
    t = points[:, rows]
    d = np.linalg.norm(t[:, :, None] - points[:, None, :], axis=0)
    y_exact = (1.0 / (1e-1 + d)) @ x_np
    rel = np.linalg.norm(y[rows] - y_exact) / np.linalg.norm(y_exact)

    nnz_per_s = compressed / t_matvec
    eff_gbs = stored_bytes / t_matvec / 1e9
    result = {
        "metric": "hmatrix_compressed_matvec",
        "value": round(nnz_per_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(eff_gbs / HBM_ROOFLINE_GBS, 4),
        "detail": {
            "N": N,
            "epsilon": eps,
            "platform": jax.devices()[0].platform,
            "backend": backend,
            "cluster_time_s": round(t_cluster, 3),
            "assembly_time_s": round(t_assembly, 3),
            "matvec_time_ms": round(t_matvec * 1e3, 4),
            "matvec_single_call_e2e_ms": round(t_single * 1e3, 2),
            "effective_GBs": round(eff_gbs, 1),
            "hbm_roofline_GBs": HBM_ROOFLINE_GBS,
            "roofline_fraction": round(eff_gbs / HBM_ROOFLINE_GBS, 4),
            "compressed_entries": int(compressed),
            "stored_bytes_padded": int(stored_bytes),
            "compression_ratio": round(N * N / max(compressed, 1), 2),
            "rel_error_sampled": float(rel),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
