"""Attribution INSIDE the slow 640-wide bucket shape: which per-block op
(lane rolls / window loads / accumulates / term math) makes W=640 blocks
run at ~220 GB/s when W=256 runs at ~1050 GB/s.  Also sweeps widths.
Writes tools/profile_matvec9b_result.json."""

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
    pad_len = L + 2048
    total = 384 << 20
    rng = np.random.default_rng(0)
    results = {}
    x1 = jnp.asarray(rng.standard_normal((pad_len, 1)).astype(np.float32))

    def make(r, W):
        per = 2 * r * W * 4
        nb = (total // per // 8) * 8
        U = jnp.asarray(rng.standard_normal((nb, r, W)).astype(np.float32))
        V = jnp.asarray(rng.standard_normal((nb, r, W)).astype(np.float32))
        t_off = jnp.asarray(rng.integers(0, L - W, nb).astype(np.int64))
        s_off = jnp.asarray(rng.integers(0, L - W, nb).astype(np.int64))
        mir = jnp.asarray(np.zeros(nb, np.int8))
        return {"dense": [], "lr": [(U, V, t_off, s_off, mir)]}, per * nb

    def timed(name, data, stored, flags):
        saved = {k: getattr(pm, k) for k in flags}
        for k, v in flags.items():
            setattr(pm, k, v)
        try:
            def fn(d, xv):
                return pm.apply_hmatrix_pallas.__wrapped__(
                    d, xv, pad_len, "N", "N", False)
            t = _chain_time(jax, jnp, fn, data, x1)
            gbs = stored / t / 1e9
            results[name] = {"ms": round(t * 1e3, 3), "GBs": round(gbs, 1)}
            print(f"{name}: {t*1e3:7.3f} ms {gbs:6.1f} GB/s", flush=True)
        except Exception as e:
            results[name] = f"ERROR: {repr(e)[:160]}"
            print(f"{name}: ERROR {repr(e)[:120]}", flush=True)
        finally:
            for k, v in saved.items():
                setattr(pm, k, v)

    d640, s640 = make(8, 640)
    timed("w640_base", d640, s640, {})
    timed("w640_norotate", d640, s640, {"_PROF_NO_ROTATE": True})
    timed("w640_static_load", d640, s640, {"_PROF_STATIC_LOAD": True})
    timed("w640_static_accum", d640, s640, {"_PROF_STATIC_ACCUM": True})
    timed("w640_static_both", d640, s640, {"_PROF_STATIC_LOAD": True,
                                           "_PROF_STATIC_ACCUM": True})
    timed("w640_skip_term", d640, s640, {"_PROF_SKIP_TERM": True})
    timed("w640_skip_all", d640, s640, {"_PROF_SKIP_TERM": True,
                                        "_PROF_STATIC_LOAD": True,
                                        "_PROF_STATIC_ACCUM": True})
    del d640
    for r, W in ((8, 512), (8, 384), (16, 384), (8, 256)):
        d, st = make(r, W)
        timed(f"w{W}_r{r}_base", d, st, {})
        del d

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec9b_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
