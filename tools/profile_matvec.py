"""Matvec kernel profile: where does the N=40000 product's time go?

Round-3 finding (VERDICT weak #2): stored bytes halved r02->r03 but matvec
time barely moved — the product is NOT bandwidth-bound.  This script builds
the headline config once and times the kernel variants in ONE TPU session:

  * pallas/VPU   — per-block broadcast-multiply-reduce (new default, k<8)
  * pallas/MXU   — per-block dot_general slivers (the r03 kernel)
  * xla          — gather -> batched GEMM -> scatter-add
  * k=8 variants — multi-RHS amortization
  * dense-only / lr-only splits for the winner

Writes tools/profile_matvec_result.json and prints a table.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _chain_time(jax, jnp, fn, data, x, reps_lo=10, reps_hi=60):
    """Device-resident repeated-apply timing, differencing two rep counts
    to cancel dispatch overhead (the TPU sits behind a ~25 ms tunnel)."""
    def chain(reps):
        @jax.jit
        def run(data, x):
            def body(i, x):
                y = fn(data, x)
                return y * (1.0 / jnp.linalg.norm(y))
            return jax.lax.fori_loop(0, reps, body, x)
        return run

    lo, hi = chain(reps_lo), chain(reps_hi)
    float(lo(data, x)[0, 0])
    float(hi(data, x)[0, 0])
    t0 = time.perf_counter(); float(lo(data, x)[0, 0])
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(hi(data, x)[0, 0])
    t_hi = time.perf_counter() - t0
    return max((t_hi - t_lo) / (reps_hi - reps_lo), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    import htool_python_tpu.ops.pallas_matvec as pm
    from htool_python_tpu.clustering.cluster import ClusterTreeBuilder
    from htool_python_tpu.hmatrix.generator import KernelGenerator
    from htool_python_tpu.hmatrix.hmatrix import HMatrixTreeBuilder
    from htool_python_tpu.models.geometry import create_random_points_in_sphere
    from htool_python_tpu.models.kernels import inverse_distance_kernel
    from htool_python_tpu.ops.matvec import apply_hmatrix_padded

    t0 = time.perf_counter()
    float(jnp.sum(jnp.zeros(8)))
    print(f"session setup {time.perf_counter() - t0:.1f}s", flush=True)

    N = int(os.environ.get("BENCH_N", 40000))
    np.random.seed(0)
    points = create_random_points_in_sphere(N)
    cb = ClusterTreeBuilder()
    cb.set_maximal_leaf_size(128)
    cluster = cb.create_cluster_tree(points, 2)
    gen = KernelGenerator(inverse_distance_kernel(1e-1), points, points)
    hb = HMatrixTreeBuilder(1e-3, 10.0, "N", "N")
    hb.set_dtype(np.float32)
    t0 = time.perf_counter()
    hm = hb.build(gen, cluster, cluster)
    jax.block_until_ready(hm._data)
    print(f"assembly {time.perf_counter() - t0:.1f}s", flush=True)

    data = hm._data
    pad_len = hm._pad_len
    stored = sum(int(np.prod(d[0].shape)) * d[0].dtype.itemsize
                 for d in data["dense"])
    stored += sum((int(np.prod(u.shape)) + int(np.prod(v.shape)))
                  * u.dtype.itemsize for u, v, *_ in data["lr"])
    dense_bytes = sum(int(np.prod(d[0].shape)) * d[0].dtype.itemsize
                      for d in data["dense"])
    lr_bytes = stored - dense_bytes
    print(f"stored {stored/1e6:.0f} MB (dense {dense_bytes/1e6:.0f}, "
          f"lr {lr_bytes/1e6:.0f})", flush=True)

    results = {"stored_bytes": stored, "N": N}

    def fresh_pallas(min_k):
        """Fresh jit of the pallas kernel with the contraction-engine
        threshold pinned at trace time."""
        def fn(data, x_pad):
            old = pm._MXU_MIN_K
            pm._MXU_MIN_K = min_k
            try:
                return pm.apply_hmatrix_pallas.__wrapped__(
                    data, x_pad, pad_len, "N", "N", False)
            finally:
                pm._MXU_MIN_K = old
        return fn

    def run_variant(name, fn, k, data_v=None):
        d = data if data_v is None else data_v
        x = jnp.asarray(np.random.rand(pad_len, k).astype(np.float32))
        t = _chain_time(jax, jnp, fn, d, x)
        gbs = stored / t / 1e9 if data_v is None else float("nan")
        results[name] = {"ms": round(t * 1e3, 4), "k": k,
                         "effective_GBs": round(gbs, 1)}
        print(f"{name:24s} k={k}  {t*1e3:8.3f} ms   {gbs:7.1f} GB/s",
              flush=True)
        return t

    xla_fn = lambda d, x: apply_hmatrix_padded(d, x, pad_len, "N", "N")

    run_variant("pallas_vpu_k1", fresh_pallas(8), 1)
    run_variant("pallas_mxu_k1", fresh_pallas(0), 1)
    run_variant("xla_k1", xla_fn, 1)
    run_variant("pallas_mxu_k8", fresh_pallas(0), 8)
    run_variant("pallas_vpu_k8", fresh_pallas(100), 8)

    # winner split: dense-only / lr-only with the VPU engine
    data_dense = {"dense": data["dense"], "lr": []}
    data_lr = {"dense": [], "lr": data["lr"]}
    x1 = jnp.asarray(np.random.rand(pad_len, 1).astype(np.float32))
    for nm, dv, nbytes in [("vpu_dense_only", data_dense, dense_bytes),
                           ("vpu_lr_only", data_lr, lr_bytes)]:
        t = _chain_time(jax, jnp, fresh_pallas(8), dv, x1)
        results[nm] = {"ms": round(t * 1e3, 4),
                       "effective_GBs": round(nbytes / t / 1e9, 1)}
        print(f"{nm:24s} k=1  {t*1e3:8.3f} ms   "
              f"{nbytes/t/1e9:7.1f} GB/s", flush=True)

    # parity spot check between engines (device-side norm, no big d2h)
    y_vpu = fresh_pallas(8)(data, x1)
    y_mxu = fresh_pallas(0)(data, x1)
    y_xla = xla_fn(data, x1)
    err1 = float(jnp.linalg.norm(y_vpu - y_xla) / jnp.linalg.norm(y_xla))
    err2 = float(jnp.linalg.norm(y_mxu - y_xla) / jnp.linalg.norm(y_xla))
    results["parity"] = {"vpu_vs_xla": err1, "mxu_vs_xla": err2}
    print(f"parity vpu-vs-xla {err1:.2e}  mxu-vs-xla {err2:.2e}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
