"""Measure the ragged-tail (zero-copy) fused kernel on the real N=40000
build: the in-jit bucket pad was re-copying every bucket on every product
(~3x hidden HBM traffic).  Expect the stored 417 MB to stream at the
~700-1000 GB/s rates of tools/profile_matvec9*_result.json.
Writes tools/profile_matvec10_result.json."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profile_matvec import _chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import htool_python_tpu.ops.pallas_matvec as pm
    from htool_python_tpu.config import get_config
    from htool_python_tpu.clustering.cluster import ClusterTreeBuilder
    from htool_python_tpu.hmatrix.generator import KernelGenerator
    from htool_python_tpu.hmatrix.hmatrix import HMatrixTreeBuilder
    from htool_python_tpu.models.geometry import \
        create_random_points_in_sphere
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
    hm = hb.build(gen, cluster, cluster)
    jax.block_until_ready(hm._data)
    print("assembly done", flush=True)
    data = hm._data
    pad_len = hm._pad_len
    stored = sum(int(np.prod(e[0].shape)) * 4 for e in data["dense"])
    stored += sum((int(np.prod(e[0].shape)) + int(np.prod(e[1].shape))) * 4
                  for e in data["lr"])
    results = {"stored_bytes": stored}
    cfg = get_config()
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.standard_normal((pad_len, 1)).astype(np.float32))
    y_ref = apply_hmatrix_padded(data, x1, pad_len, "N", "N")

    for name, mode, k in (("fused_k1", "fused", 1),
                          ("per_bucket_k1", "per_bucket", 1),
                          ("fused_k8", "fused", 8)):
        cfg.matvec_kernel_mode = mode
        x = (x1 if k == 1 else jnp.asarray(
            rng.standard_normal((pad_len, k)).astype(np.float32)))

        def fn(dd, xv):
            return pm.apply_hmatrix_pallas.__wrapped__(dd, xv, pad_len,
                                                       "N", "N", False)
        try:
            y = fn(data, x)
            err = (float(jnp.linalg.norm(y - y_ref)
                         / jnp.linalg.norm(y_ref)) if k == 1 else -1.0)
            t = _chain_time(jax, jnp, fn, data, x)
            gbs = stored / t / 1e9
            results[name] = {"ms": round(t * 1e3, 3),
                             "GBs": round(gbs, 1), "err_vs_xla": err}
            print(f"{name}: {t*1e3:7.3f} ms {gbs:6.1f} GB/s err {err:.2e}",
                  flush=True)
        except Exception as e:
            results[name] = f"ERROR: {repr(e)[:200]}"
            print(f"{name}: ERROR {repr(e)[:150]}", flush=True)
    # transposed parity too (ragged path on the swap side)
    cfg.matvec_kernel_mode = "fused"

    def fnT(dd, xv):
        return pm.apply_hmatrix_pallas.__wrapped__(dd, xv, pad_len, "T",
                                                   "N", False)
    yT = fnT(data, x1)
    yT_ref = apply_hmatrix_padded(data, x1, pad_len, "T", "N")
    errT = float(jnp.linalg.norm(yT - yT_ref) / jnp.linalg.norm(yT_ref))
    results["parity_T"] = errT
    print(f"parity T: {errT:.2e}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec10_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
