"""Shared example scaffolding.

The reference's examples run under `mpirun -np P`; the TPU-native execution
model is SPMD in one process, so P comes from HTOOL_TPU_PARTITIONS (default
2) and "rank 0 prints" becomes plain printing.  Plots are saved as PNGs next
to the script (headless-friendly) instead of plt.show() unless
HTOOL_TPU_SHOW_PLOTS=1.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import matplotlib

if not os.environ.get("HTOOL_TPU_SHOW_PLOTS"):
    matplotlib.use("Agg")

# honor JAX_PLATFORMS even when the runtime image force-registers an
# accelerator backend at import (sitecustomize): the examples are small
# educational workloads, so an explicit platform request must win
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if "cpu" in os.environ["JAX_PLATFORMS"]:
        # f64 like the reference when running on host (TPUs stay f32)
        jax.config.update("jax_enable_x64", True)


def n_partitions(default: int = 2) -> int:
    return int(os.environ.get("HTOOL_TPU_PARTITIONS", default))


def finish_plot(fig, name: str) -> None:
    import matplotlib.pyplot as plt

    if os.environ.get("HTOOL_TPU_SHOW_PLOTS"):
        plt.show()
    else:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           name + ".png")
        fig.savefig(out, dpi=110)
        print(f"plot saved to {out}")
    plt.close(fig)
