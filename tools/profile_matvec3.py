"""Pipeline-floor isolation for the fused matvec kernel.

Aligned storage removed the rotates and got SLOWER (extra bytes), and the
old serialized kernel with rotates/addressing disabled hit the same ~2.1ms
floor as the batched kernel — so the cost is in the Pallas PIPELINE, not
the per-block math.  Quantify it:

  * stream-only kernels: one big array, grid steps of 1/4/16 MB, kernel
    body = accumulate a few lanes.  Pure pipelined DMA rate per step size.
  * multi-buffer stream: the same bytes split across B parallel input
    buffers with frozen index maps (the fused kernel's structure) — the
    cost of carrying B buffered arrays per grid step.
  * the real product for reference.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profile_matvec import _chain_time  # noqa: E402

TOTAL_MB = 384


def stream_kernel(n_buf, *refs):
    ins = refs[:n_buf]
    x_ref = refs[n_buf]
    out = refs[n_buf + 1]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out[:] = x_ref[...]  # loop-carried dependence: no hoisting

    acc = out[...]
    for r in ins:
        acc = acc + jnp.sum(r[...], axis=0)[:128].reshape(1, 128)
    out[:] = acc


def make_stream(step_mb, n_buf):
    """n_buf buffers of TOTAL_MB/n_buf each; bucket b owns a contiguous
    range of grid steps (frozen index maps outside), mirroring the fused
    product's structure."""
    per_buf_mb = TOTAL_MB // n_buf
    rows_per_step = step_mb * (1 << 20) // (512 * 4)
    steps_per_buf = per_buf_mb * (1 << 20) // (step_mb * (1 << 20))
    rows = steps_per_buf * rows_per_step
    bufs = [np.random.rand(rows, 512).astype(np.float32)
            for _ in range(n_buf)]
    grid = steps_per_buf * n_buf
    in_specs = []
    for b in range(n_buf):
        def imap(i, b=b, spb=steps_per_buf):
            return (jnp.clip(i - b * spb, 0, spb - 1), 0)
        in_specs.append(pl.BlockSpec((rows_per_step, 512), imap))

    in_specs.append(pl.BlockSpec((1, 128), lambda i: (0, 0)))

    @jax.jit
    def run(bufs, x):
        return pl.pallas_call(
            partial(stream_kernel, n_buf),
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(*bufs, x)

    return bufs, run, grid


def main():
    t0 = time.perf_counter()
    float(jnp.sum(jnp.zeros(8)))
    print(f"session setup {time.perf_counter() - t0:.1f}s", flush=True)
    results = {}
    nbytes = TOTAL_MB * (1 << 20)
    x = jnp.zeros((1, 128), jnp.float32)
    for step_mb, n_buf in [(1, 1), (4, 1), (16, 1), (1, 4), (1, 12),
                           (1, 24), (4, 12)]:
        try:
            bufs, run, grid = make_stream(step_mb, n_buf)
            bufs = [jnp.asarray(b) for b in bufs]
            t = _chain_time(jax, jnp, lambda d, xx: run(d, xx), bufs, x,
                            reps_lo=50, reps_hi=350)
            gbs = nbytes / t / 1e9
            us_per_step = t / grid * 1e6
            results[f"s{step_mb}MB_b{n_buf}"] = {
                "ms": round(t * 1e3, 3), "GBs": round(gbs, 1),
                "steps": grid, "us_per_step": round(us_per_step, 3)}
            print(f"step {step_mb}MB x {n_buf} bufs: {t*1e3:7.3f} ms "
                  f"{gbs:6.1f} GB/s  {grid:5d} steps  "
                  f"{us_per_step:6.2f} us/step", flush=True)
        except Exception as e:
            results[f"s{step_mb}MB_b{n_buf}"] = {"error": repr(e)[:160]}
            print(f"step {step_mb}MB x {n_buf}: ERROR {repr(e)[:120]}",
                  flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec3_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
