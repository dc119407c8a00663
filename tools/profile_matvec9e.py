"""Offset-structure attribution: synthetic (r8, w1024) bucket — fast with
uniform random offsets (839 GB/s) — re-timed with REAL-plan-like offsets:
target offsets drawn from a small set of band starts (each band shared by
many blocks, as in an H-matrix block row).  If banded offsets reproduce
the ~226 GB/s real rate, the bottleneck is the serialized same-address
read-modify-write accumulation chains, and the fix is a sublane-spread
accumulator.  Writes tools/profile_matvec9e_result.json."""

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
    r, W = 8, 1024
    per = 2 * r * W * 4
    nb = (total // per // 8) * 8
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((nb, r, W)).astype(np.float32))
    V = jnp.asarray(rng.standard_normal((nb, r, W)).astype(np.float32))
    mir = jnp.asarray(np.zeros(nb, np.int8))
    x1 = jnp.asarray(rng.standard_normal((pad_len, 1)).astype(np.float32))
    results = {"nb": nb}

    bands = np.arange(0, L - W, (L - W) // 62)  # ~62 distinct band starts

    def offsets(kind):
        if kind == "rand":
            return rng.integers(0, L - W, nb).astype(np.int64)
        if kind == "banded_sorted":
            o = np.sort(rng.choice(bands, nb))
            return o.astype(np.int64)
        if kind == "banded_shuffled":
            o = rng.choice(bands, nb)
            return o.astype(np.int64)
        if kind == "const":
            return np.zeros(nb, np.int64) + 1024
        raise ValueError(kind)

    cases = [
        ("t_rand__s_rand", "rand", "rand"),
        ("t_band_sorted__s_rand", "banded_sorted", "rand"),
        ("t_band_shuf__s_rand", "banded_shuffled", "rand"),
        ("t_rand__s_band", "rand", "banded_sorted"),
        ("t_band__s_band", "banded_sorted", "banded_sorted"),
        ("t_const__s_rand", "const", "rand"),
    ]
    for name, tk, sk in cases:
        t_off = jnp.asarray(offsets(tk))
        s_off = jnp.asarray(offsets(sk))
        d = {"dense": [], "lr": [(U, V, t_off, s_off, mir)]}

        def fn(dd, xv):
            return pm.apply_hmatrix_pallas.__wrapped__(dd, xv, pad_len,
                                                       "N", "N", False)
        try:
            t = _chain_time(jax, jnp, fn, d, x1)
            gbs = per * nb / t / 1e9
            results[name] = {"ms": round(t * 1e3, 3), "GBs": round(gbs, 1)}
            print(f"{name}: {t*1e3:7.3f} ms {gbs:6.1f} GB/s", flush=True)
        except Exception as e:
            results[name] = f"ERROR: {repr(e)[:160]}"
            print(f"{name}: ERROR {repr(e)[:120]}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec9e_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
