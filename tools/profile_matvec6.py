"""Validate + time the sequential emit_pipeline matvec kernel
(ops/pallas_matvec.py _launch_seq) against the outer-grid fused kernel
and the XLA path on a real N=40000 build, on the TPU.

Checks: f32 'N'/'T' at k=1 and k=8, symmetric 'S' storage, and the
complex64 plane path on a smaller build.  Writes
tools/profile_matvec6_result.json.
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

    import htool_python_tpu as H
    from htool_python_tpu.config import get_config
    from htool_python_tpu.clustering.cluster import ClusterTreeBuilder
    from htool_python_tpu.hmatrix.generator import KernelGenerator
    from htool_python_tpu.hmatrix.hmatrix import HMatrixTreeBuilder
    from htool_python_tpu.models.geometry import \
        create_random_points_in_sphere
    from htool_python_tpu.models.kernels import inverse_distance_kernel
    from htool_python_tpu.ops.pallas_matvec import apply_hmatrix_pallas
    from htool_python_tpu.ops.matvec import apply_hmatrix_padded

    t0 = time.perf_counter()
    float(jnp.sum(jnp.zeros(8)))
    print(f"session setup {time.perf_counter() - t0:.1f}s", flush=True)

    results = {}
    cfg = get_config()
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
    stored = sum(int(np.prod(d[0].shape)) * 4 for d in data["dense"])
    stored += sum((int(np.prod(u.shape)) + int(np.prod(v.shape))) * 4
                  for u, v, *_ in data["lr"])
    results["stored_bytes"] = stored

    def run(seq, trans, k, sym="N"):
        cfg.matvec_seq_pipeline = seq
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (pad_len, k)).astype(np.float32))

        @jax.jit
        def f(d, xv):
            return apply_hmatrix_pallas.__wrapped__(d, xv, pad_len, trans,
                                                    sym, False)
        y = f(data, x)
        return x, y, f

    # --- numeric parity seq vs fused vs XLA (norms on device) ---
    for trans in ("N", "T"):
        x, y_seq, _ = run(True, trans, 1)
        _, y_fus, _ = run(False, trans, 1)
        cfg.matvec_seq_pipeline = True
        y_xla = apply_hmatrix_padded(data, x, pad_len, trans, "N")
        dn = float(jnp.linalg.norm(y_seq - y_xla) /
                   jnp.linalg.norm(y_xla))
        df = float(jnp.linalg.norm(y_seq - y_fus) /
                   jnp.linalg.norm(y_xla))
        results[f"parity_{trans}_k1"] = {"vs_xla": dn, "vs_fused": df}
        print(f"parity {trans} k=1: vs_xla {dn:.2e} vs_fused {df:.2e}",
              flush=True)
    x8, y8_seq, _ = run(True, "N", 8)
    _, y8_fus, _ = run(False, "N", 8)
    d8 = float(jnp.linalg.norm(y8_seq - y8_fus) / jnp.linalg.norm(y8_fus))
    results["parity_N_k8"] = d8
    print(f"parity N k=8 vs fused: {d8:.2e}", flush=True)

    # --- timing ---
    for name, seq, k in (("fused_k1", False, 1), ("seq_k1", True, 1),
                         ("seq_k8", True, 8)):
        cfg.matvec_seq_pipeline = seq

        def tf(d, xv, seq=seq):
            cfg.matvec_seq_pipeline = seq
            return apply_hmatrix_pallas.__wrapped__(d, xv, pad_len, "N",
                                                    "N", False)
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (pad_len, k)).astype(np.float32))
        t = _chain_time(jax, jnp, tf, data, x)
        gbs = stored / t / 1e9
        results[name] = {"ms": round(t * 1e3, 3), "GBs": round(gbs, 1)}
        print(f"{name}: {t*1e3:7.3f} ms {gbs:6.1f} GB/s", flush=True)

    cfg.matvec_seq_pipeline = True
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec6_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
