"""Matvec kernel time attribution (round 4, follow-up to profile_matvec).

profile_matvec.py showed the low-rank stream at ~96 GB/s with the engine
choice (VPU vs MXU) nearly irrelevant — so the cost is per-step pipeline
overhead, per-block dynamic addressing, or the lane rotates.  This script
separates them with intentionally-WRONG timing probes:

  * step bytes 256K / 1M / 4M — per-STEP overhead scaling
  * no_rotate — rotates removed (cost of pltpu.roll)
  * static_off — all dynamic addressing removed (pure stream+compute floor)
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

    results = {"stored_bytes": stored, "N": N}

    def variant(step_bytes, no_rotate=False, static_off=False):
        def fn(data, x_pad):
            old = (pm._STEP_BYTES, pm._PROF_NO_ROTATE, pm._PROF_STATIC_OFF)
            pm._STEP_BYTES = step_bytes
            pm._PROF_NO_ROTATE = no_rotate
            pm._PROF_STATIC_OFF = static_off
            try:
                return pm.apply_hmatrix_pallas.__wrapped__(
                    data, x_pad, pad_len, "N", "N", False)
            finally:
                (pm._STEP_BYTES, pm._PROF_NO_ROTATE,
                 pm._PROF_STATIC_OFF) = old
        return fn

    x1 = jnp.asarray(np.random.rand(pad_len, 1).astype(np.float32))

    cases = [
        ("base_256K", variant(1 << 18)),
        ("step_1M", variant(1 << 20)),
        ("step_4M", variant(1 << 22)),
        ("norot_256K", variant(1 << 18, no_rotate=True)),
        ("norot_1M", variant(1 << 20, no_rotate=True)),
        ("static_256K", variant(1 << 18, static_off=True)),
        ("static_1M", variant(1 << 20, static_off=True)),
        ("static_4M", variant(1 << 22, static_off=True)),
    ]
    for name, fn in cases:
        try:
            t = _chain_time(jax, jnp, fn, data, x1)
        except Exception as e:  # 4M steps can exceed the VMEM budget
            results[name] = {"error": repr(e)[:200]}
            print(f"{name:16s} ERROR {repr(e)[:120]}", flush=True)
            continue
        results[name] = {"ms": round(t * 1e3, 4),
                         "effective_GBs": round(stored / t / 1e9, 1)}
        print(f"{name:16s} {t*1e3:8.3f} ms  {stored/t/1e9:7.1f} GB/s",
              flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec2_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
