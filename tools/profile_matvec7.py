"""Sweep the sequential-pipeline kernel's step size / group cap and
isolate the emit_pipeline per-step overhead (empty-body variant) on the
real N=40000 build.  Writes tools/profile_matvec7_result.json."""

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
    pad_len = hm._pad_len
    stored = sum(int(np.prod(d[0].shape)) * 4 for d in data["dense"])
    stored += sum((int(np.prod(u.shape)) + int(np.prod(v.shape))) * 4
                  for u, v, *_ in data["lr"])
    results = {"stored_bytes": stored}
    x1 = jnp.asarray(np.random.default_rng(1).standard_normal(
        (pad_len, 1)).astype(np.float32))

    real_body = pm._step_body

    def empty_body(*a, **k):
        pass

    cases = [
        ("sb4M_g96", 4 << 20, 96, True),
        ("empty_sb4M_g96", 4 << 20, 96, False),
        ("sb8M_g128", 8 << 20, 128, True),
        ("sb16M_g192", 16 << 20, 192, True),
        ("sb16M_g384", 16 << 20, 384, True),
        ("empty_sb16M_g192", 16 << 20, 192, False),
    ]
    for name, sb, mg, with_body in cases:
        pm._SEQ_STEP_BYTES = sb
        pm._SEQ_MAX_GROUP = mg
        pm._step_body = real_body if with_body else empty_body

        def fn(d, xv):
            return pm.apply_hmatrix_pallas.__wrapped__(d, xv, pad_len,
                                                       "N", "N", False)
        try:
            t = _chain_time(jax, jnp, fn, data, x1)
            gbs = stored / t / 1e9
            results[name] = {"ms": round(t * 1e3, 3), "GBs": round(gbs, 1)}
            print(f"{name}: {t*1e3:7.3f} ms {gbs:6.1f} GB/s", flush=True)
        except Exception as e:
            results[name] = f"ERROR: {repr(e)[:200]}"
            print(f"{name}: ERROR {repr(e)[:150]}", flush=True)
    pm._step_body = real_body

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec7_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
