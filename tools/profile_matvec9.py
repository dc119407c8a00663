"""Per-shape kernel-rate sweep: one synthetic bucket per real plan shape,
384 MB each, through the production fused kernel — which block shape is
responsible for the N=40000 product running at ~220 GB/s when an (r16,
256-wide) bucket streams at 718 GB/s?  Writes
tools/profile_matvec9_result.json."""

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

    t0 = time.perf_counter()
    float(jnp.sum(jnp.zeros(8)))
    print(f"session setup {time.perf_counter() - t0:.1f}s", flush=True)

    L = 40960
    pad_len = L + 1024
    total = 384 << 20
    rng = np.random.default_rng(0)
    results = {}
    x1 = jnp.asarray(rng.standard_normal((pad_len, 1)).astype(np.float32))

    shapes = [
        ("lr_r8_w640", "lr", 8, 640),
        ("lr_r16_w640", "lr", 16, 640),
        ("lr_r64_w640", "lr", 64, 640),
        ("lr_r16_w256", "lr", 16, 256),
        ("lr_r32_w128", "lr", 32, 128),
        ("dense_128", "dense", 0, 128),
    ]
    for name, kind, r, W in shapes:
        if kind == "lr":
            per = 2 * r * W * 4
            nb = (total // per // 8) * 8
            U = rng.standard_normal((nb, r, W)).astype(np.float32)
            V = rng.standard_normal((nb, r, W)).astype(np.float32)
            arrays = (jnp.asarray(U), jnp.asarray(V))
        else:
            per = W * W * 4
            nb = (total // per // 8) * 8
            arrays = (jnp.asarray(
                rng.standard_normal((nb, W, W)).astype(np.float32)),)
        t_off = rng.integers(0, L - W, nb).astype(np.int64)
        s_off = rng.integers(0, L - W, nb).astype(np.int64)
        mir = np.zeros(nb, np.int8)
        if kind == "lr":
            data = {"dense": [], "lr": [(arrays[0], arrays[1],
                                         jnp.asarray(t_off),
                                         jnp.asarray(s_off),
                                         jnp.asarray(mir))]}
        else:
            data = {"dense": [(arrays[0], jnp.asarray(t_off),
                               jnp.asarray(s_off), jnp.asarray(mir))],
                    "lr": []}
        stored = per * nb

        def fn(d, xv):
            return pm.apply_hmatrix_pallas.__wrapped__(d, xv, pad_len, "N",
                                                       "N", False)
        try:
            t = _chain_time(jax, jnp, fn, data, x1)
            gbs = stored / t / 1e9
            results[name] = {"ms": round(t * 1e3, 3), "GBs": round(gbs, 1),
                             "nb": nb}
            print(f"{name}: {t*1e3:7.3f} ms {gbs:6.1f} GB/s nb={nb}",
                  flush=True)
        except Exception as e:
            results[name] = f"ERROR: {repr(e)[:200]}"
            print(f"{name}: ERROR {repr(e)[:150]}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec9_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
