"""Pure-stream rate by buffer SHAPE: does a pipelined (nb, 16, 640) f32
buffer stream slower than (nb, 32, 256) / 2-D (rows, W)?  Isolates the
DMA/layout effect found in profile_matvec9b (w640 lr buckets at ~220 GB/s
with per-block ops exonerated).  Writes tools/profile_matvec9c_result.json."""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from profile_matvec import _chain_time  # noqa: E402

TOTAL = 384 << 20


def stream(shape, G):
    """Time streaming a (nb, *shape) f32 array in (G, *shape) windows."""
    per = int(np.prod(shape)) * 4
    nb = (TOTAL // per // G) * G
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((nb,) + shape).astype(np.float32))
    steps = nb // G

    def kernel(a_ref, x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            # loop-carried dependence on x: no hoisting out of the chain
            o_ref[:] = x_ref[...]
        o_ref[:] = o_ref[...] + jnp.sum(a_ref[...]).reshape(1, 1) * 1e-30

    def fn(a, x):
        return pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[pl.BlockSpec((G,) + shape,
                                   lambda i: (i,) + (0,) * len(shape)),
                      pl.BlockSpec((1, 1), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=114 * 1024 * 1024),
        )(a, x)

    x = jnp.zeros((1, 1), jnp.float32)
    t = _chain_time(jax, jnp, fn, A, x)
    return t, per * nb


def main():
    t0 = time.perf_counter()
    float(jnp.sum(jnp.zeros(8)))
    print(f"session setup {time.perf_counter() - t0:.1f}s", flush=True)

    results = {}
    cases = [
        ("3d_16x640_G96", (16, 640), 96),
        ("3d_32x256_G96", (32, 256), 96),
        ("3d_16x640_G24", (16, 640), 24),
        ("3d_80x128_G96", (80, 128), 96),
        ("3d_16x512_G96", (16, 512), 96),
        ("3d_16x768_G96", (16, 768), 96),
        ("3d_16x1024_G64", (16, 1024), 64),
        ("2d_8192x640_G1", (8192, 640), 1),
        ("2d_8192x256_G1", (8192, 256), 1),
        ("2d_8192x768_G1", (8192, 768), 1),
        ("2d_8192x1024_G1", (8192, 1024), 1),
    ]
    for name, shape, G in cases:
        try:
            t, stored = stream(shape, G)
            gbs = stored / t / 1e9
            results[name] = {"ms": round(t * 1e3, 3), "GBs": round(gbs, 1)}
            print(f"{name}: {t*1e3:7.3f} ms {gbs:6.1f} GB/s", flush=True)
        except Exception as e:
            results[name] = f"ERROR: {repr(e)[:160]}"
            print(f"{name}: ERROR {repr(e)[:120]}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec9c_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
