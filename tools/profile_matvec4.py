"""Attribution INSIDE the batched kernel body (follow-up to
profile_matvec3: the pipeline streams at ~750 GB/s, so the ~2 ms product
is body-bound).  Variants toggle the granular probe flags:

  base          the real product
  static_load   x gathers at offset 0 (no per-block load rotate)
  static_accum  y accumulation at offset 0 (no per-block store rotate)
  static_both   both
  skip_term     block math replaced by one add per tile (io only)
  skip_all      skip_term + static_both (pipeline + stack only)
"""

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
    from htool_python_tpu.models.geometry import create_random_points_in_sphere
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
    results = {"stored_bytes": stored, "N": N}

    def variant(**flags):
        def fn(d, x):
            saved = {k: getattr(pm, k) for k in flags}
            for k, v in flags.items():
                setattr(pm, k, v)
            try:
                return pm.apply_hmatrix_pallas.__wrapped__(
                    d, x, pad_len, "N", "N", False)
            finally:
                for k, v in saved.items():
                    setattr(pm, k, v)
        return fn

    x1 = jnp.asarray(np.random.rand(pad_len, 1).astype(np.float32))
    cases = [
        ("base", {}),
        ("static_load", {"_PROF_STATIC_LOAD": True}),
        ("static_accum", {"_PROF_STATIC_ACCUM": True}),
        ("static_both", {"_PROF_STATIC_LOAD": True,
                         "_PROF_STATIC_ACCUM": True}),
        ("skip_term", {"_PROF_SKIP_TERM": True}),
        ("skip_all", {"_PROF_SKIP_TERM": True, "_PROF_STATIC_LOAD": True,
                      "_PROF_STATIC_ACCUM": True}),
    ]
    for name, flags in cases:
        try:
            t = _chain_time(jax, jnp, variant(**flags), data, x1)
            results[name] = {"ms": round(t * 1e3, 3),
                             "GBs": round(stored / t / 1e9, 1)}
            print(f"{name:14s} {t*1e3:7.3f} ms  {stored/t/1e9:6.1f} GB/s",
                  flush=True)
        except Exception as e:
            results[name] = {"error": repr(e)[:160]}
            print(f"{name:14s} ERROR {repr(e)[:120]}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec4_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
