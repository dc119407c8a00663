"""Decide the wide-bucket fix: (a) synthetic rates at pow2 widths
768/896/1024, (b) the REAL N=40000 build with every bucket's lane width
padded up to a power of two (pack-time emulation) through the production
kernel — does byte inflation buy back the 4x non-pow2 penalty?
Writes tools/profile_matvec9d_result.json."""

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
    from htool_python_tpu.ops.matvec import apply_hmatrix_padded

    t0 = time.perf_counter()
    float(jnp.sum(jnp.zeros(8)))
    print(f"session setup {time.perf_counter() - t0:.1f}s", flush=True)

    results = {}
    rng = np.random.default_rng(0)

    # (a) synthetic pow2-width rates
    L = 40960
    pad_syn = L + 2048
    x1s = jnp.asarray(rng.standard_normal((pad_syn, 1)).astype(np.float32))
    total = 384 << 20
    for r, W in ((8, 768), (8, 896), (8, 1024), (16, 1024)):
        per = 2 * r * W * 4
        nb = (total // per // 8) * 8
        U = jnp.asarray(rng.standard_normal((nb, r, W)).astype(np.float32))
        V = jnp.asarray(rng.standard_normal((nb, r, W)).astype(np.float32))
        t_off = jnp.asarray(rng.integers(0, L - W, nb).astype(np.int64))
        s_off = jnp.asarray(rng.integers(0, L - W, nb).astype(np.int64))
        mir = jnp.asarray(np.zeros(nb, np.int8))
        d = {"dense": [], "lr": [(U, V, t_off, s_off, mir)]}

        def fn(dd, xv):
            return pm.apply_hmatrix_pallas.__wrapped__(dd, xv, pad_syn,
                                                       "N", "N", False)
        try:
            t = _chain_time(jax, jnp, fn, d, x1s)
            gbs = per * nb / t / 1e9
            results[f"syn_r{r}_w{W}"] = {"ms": round(t * 1e3, 3),
                                         "GBs": round(gbs, 1)}
            print(f"syn_r{r}_w{W}: {t*1e3:7.3f} ms {gbs:6.1f} GB/s",
                  flush=True)
        except Exception as e:
            results[f"syn_r{r}_w{W}"] = f"ERROR: {repr(e)[:160]}"
            print(f"syn_r{r}_w{W}: ERROR {repr(e)[:120]}", flush=True)
        del U, V, d

    # (b) real build, pow2-padded storage
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

    def padw(a):
        W = a.shape[2]
        W2 = _pow2_up(W)
        if W2 == W:
            return a
        return jnp.pad(a, ((0, 0), (0, 0), (0, W2 - W)))

    data2 = {"dense": [(padw(D), t, s, m) for D, t, s, m in data["dense"]],
             "lr": [(padw(U), padw(V), t, s, m)
                    for U, V, t, s, m in data["lr"]]}
    jax.block_until_ready(data2)
    stored = sum(int(np.prod(e[0].shape)) * 4 for e in data2["dense"])
    stored += sum((int(np.prod(e[0].shape)) + int(np.prod(e[1].shape))) * 4
                  for e in data2["lr"])
    stored0 = sum(int(np.prod(e[0].shape)) * 4 for e in data["dense"])
    stored0 += sum((int(np.prod(e[0].shape)) + int(np.prod(e[1].shape))) * 4
                   for e in data["lr"])
    results["real_bytes"] = {"orig": stored0, "pow2": stored}
    pad2 = pad_len + 2048  # pow2 widths widen the rotate windows
    x1 = jnp.asarray(rng.standard_normal((pad2, 1)).astype(np.float32))

    y_ref = apply_hmatrix_padded(data, x1[:pad_len], pad_len, "N", "N")

    def fn2(dd, xv):
        return pm.apply_hmatrix_pallas.__wrapped__(dd, xv, pad2, "N", "N",
                                                   False)
    y2 = fn2(data2, x1)
    err = float(jnp.linalg.norm(y2[:pad_len] - y_ref)
                / jnp.linalg.norm(y_ref))
    t = _chain_time(jax, jnp, fn2, data2, x1)
    results["real_pow2"] = {"ms": round(t * 1e3, 3),
                            "GBs_padded": round(stored / t / 1e9, 1),
                            "GBs_orig_bytes": round(stored0 / t / 1e9, 1),
                            "err_vs_xla": err}
    print(f"real_pow2: {t*1e3:7.3f} ms "
          f"{stored/t/1e9:6.1f} GB/s (padded) err {err:.2e}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec9d_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
