"""Final cell of the kernel-rate matrix: REAL N=40000 build, lane widths
padded to powers of two, timed in per_bucket mode (one launch per bucket)
vs fused — plus each bucket alone.  Synthetic pow2 single buckets run at
700-1000 GB/s while the fused real product sits at ~226; this isolates
whether the fused multi-bucket program is the last bottleneck.
Writes tools/profile_matvec9f_result.json."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profile_matvec import _chain_time  # noqa: E402


def _pow2_up(n):
    p = 128
    while p < n:
        p *= 2
    return p


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
    pad2 = hm._pad_len + 2048
    cfg = get_config()
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.standard_normal((pad2, 1)).astype(np.float32))
    results = {}

    def padw(a):
        W2 = _pow2_up(a.shape[2])
        return a if W2 == a.shape[2] else jnp.pad(
            a, ((0, 0), (0, 0), (0, W2 - a.shape[2])))

    data2 = {"dense": [(padw(D), t, s, m) for D, t, s, m in data["dense"]],
             "lr": [(padw(U), padw(V), t, s, m)
                    for U, V, t, s, m in data["lr"]]}
    jax.block_until_ready(data2)
    stored = sum(int(np.prod(e[0].shape)) * 4 for e in data2["dense"])
    stored += sum((int(np.prod(e[0].shape)) + int(np.prod(e[1].shape))) * 4
                  for e in data2["lr"])
    results["stored_pow2"] = stored

    def timed(name, d, st, mode):
        cfg.matvec_kernel_mode = mode

        def fn(dd, xv):
            return pm.apply_hmatrix_pallas.__wrapped__(dd, xv, pad2, "N",
                                                       "N", False)
        try:
            t = _chain_time(jax, jnp, fn, d, x1)
            gbs = st / t / 1e9
            results[name] = {"ms": round(t * 1e3, 3), "GBs": round(gbs, 1)}
            print(f"{name}: {t*1e3:7.3f} ms {gbs:6.1f} GB/s", flush=True)
        except Exception as e:
            results[name] = f"ERROR: {repr(e)[:160]}"
            print(f"{name}: ERROR {repr(e)[:120]}", flush=True)

    timed("real_pow2_per_bucket", data2, stored, "per_bucket")
    timed("real_pow2_fused", data2, stored, "fused")
    # biggest lr bucket alone
    sizes = [(int(np.prod(U.shape)) + int(np.prod(V.shape)),
              i) for i, (U, V, *_ ) in enumerate(data2["lr"])]
    sizes.sort(reverse=True)
    for rank_i, (sz, i) in enumerate(sizes[:3]):
        e = data2["lr"][i]
        d1 = {"dense": [], "lr": [e]}
        st1 = sz * 4
        shape = f"{e[0].shape[1]}x{e[0].shape[2]}"
        timed(f"real_bucket{rank_i}_{shape}", d1, st1, "fused")
    cfg.matvec_kernel_mode = "fused"

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec9f_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
