"""A user-supplied compression hook: truncated SVD with a worthwhileness
check.

Subclass `VirtualLowRankGenerator` and implement
`build_low_rank_approximation(rows, cols, epsilon)`:

* call `set_U(U)` / `set_V(V)` and return True to store the block low-rank;
* return False to tell assembly the block is not worth compressing — it is
  then filled densely instead.

The hook runs on the host per block (it is the escape hatch for custom
numerics); the framework's default compressor is the device-batched ACA.
Porting from Htool: identical contract to the reference's
VirtualLowRankGenerator (set_U/set_V/allow_copy/clear_data).
"""

import numpy as np

import htool_python_tpu as Htool


class CustomSVD(Htool.VirtualLowRankGenerator):
    """Optimal (SVD) per-block compression against a host generator."""

    def __init__(self, generator: Htool.VirtualGenerator,
                 allow_copy: bool = True):
        super().__init__(allow_copy)
        self.generator = generator

    def build_low_rank_approximation(self, rows, cols, epsilon):
        m, n = len(rows), len(cols)
        block = np.zeros((m, n), order="F")
        self.generator.build_submatrix(rows, cols, block)
        u, s, vh = np.linalg.svd(block, full_matrices=False)
        # smallest rank whose discarded tail has Frobenius mass below
        # epsilon * ||block||_F
        tail_mass = np.sqrt(np.cumsum((s ** 2)[::-1]))[::-1]
        above = np.nonzero(tail_mass >= epsilon * np.linalg.norm(block))[0]
        rank = int(above[-1]) + 1 if len(above) else 1
        if rank * (m + n) > m * n:
            return False  # storing factors would cost more than the block
        self.set_U(u[:, :rank] * s[:rank])
        self.set_V(vh[:rank, :])
        return True
