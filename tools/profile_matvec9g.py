"""2x2 swap on the slow real r8-w1024 bucket: {real, random} data x
{real, random} offsets.  Identical shapes/kernel throughout — whichever
axis drags the rate from ~840 to ~236 GB/s is the cause.
Writes tools/profile_matvec9g_result.json."""

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

    # biggest lr bucket, pow2-padded
    best = max(range(len(hm._data["lr"])),
               key=lambda i: int(np.prod(hm._data["lr"][i][0].shape)))
    U, V, t_off, s_off, mir = hm._data["lr"][best]

    def padw(a):
        W2 = _pow2_up(a.shape[2])
        return a if W2 == a.shape[2] else jnp.pad(
            a, ((0, 0), (0, 0), (0, W2 - a.shape[2])))
    U = padw(U)
    V = padw(V)
    jax.block_until_ready((U, V))
    nb, r, W = U.shape
    print(f"bucket shape {U.shape}", flush=True)
    pad2 = hm._pad_len + 2048
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.standard_normal((pad2, 1)).astype(np.float32))
    st = (int(np.prod(U.shape)) + int(np.prod(V.shape))) * 4

    U_r = jnp.asarray(rng.standard_normal(U.shape).astype(np.float32))
    V_r = jnp.asarray(rng.standard_normal(V.shape).astype(np.float32))
    t_r = jnp.asarray(rng.integers(0, N - 700, nb).astype(np.int64))
    s_r = jnp.asarray(rng.integers(0, N - 700, nb).astype(np.int64))
    results = {"nb": int(nb), "W": int(W)}

    cases = [
        ("realdata_realoff", U, V, t_off, s_off),
        ("realdata_randoff", U, V, t_r, s_r),
        ("randdata_realoff", U_r, V_r, t_off, s_off),
        ("randdata_randoff", U_r, V_r, t_r, s_r),
    ]
    for name, Uu, Vv, tt, ss in cases:
        d = {"dense": [], "lr": [(Uu, Vv, tt, ss, mir)]}

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

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec9g_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
