"""Run ONLY the distributed_2part bench stage (iteration driver for the
block-row build amortization work, VERDICT r04 #4).

Usage: python tools/bench_distributed_only.py   [BENCH_N2 to set N]
Prints the stage dict as one JSON line.  Obeys the one-TPU-process rule:
run it alone.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import bench

    # absorb session setup before any timed region
    import time
    t0 = time.perf_counter()
    float(jnp.sum(jnp.zeros(8)))
    setup = time.perf_counter() - t0
    out = bench._stage_distributed(jax, jnp, np)
    out["session_setup_s"] = round(setup, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
