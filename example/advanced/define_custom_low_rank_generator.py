"""Custom low-rank compression hook (reference:
example/advanced/define_custom_low_rank_generator.py:13-31 contract):
`build_low_rank_approximation(rows, cols, epsilon)` returns factors via
set_U / set_V, or False when compression is not worthwhile (=> densify).
"""

import numpy as np

import htool_python_tpu as Htool


class CustomSVD(Htool.VirtualLowRankGenerator):
    def __init__(self, generator: Htool.VirtualGenerator,
                 allow_copy: bool = True):
        super().__init__(allow_copy)
        self.generator = generator

    def build_low_rank_approximation(self, rows, cols, epsilon):
        submat = np.zeros((len(rows), len(cols)), order="F")
        self.generator.build_submatrix(rows, cols, submat)
        u, s, vh = np.linalg.svd(submat, full_matrices=False)
        # keep singular values until the discarded tail's Frobenius mass
        # drops below epsilon * ||submat||
        norm = np.linalg.norm(submat)
        tail = np.sqrt(np.cumsum(s[::-1] ** 2))[::-1]
        keep = np.nonzero(tail >= epsilon * norm)[0]
        truncated_rank = (int(keep[-1]) + 1) if len(keep) else 1
        if truncated_rank * (len(rows) + len(cols)) > len(rows) * len(cols):
            return False  # the low-rank approximation is not worthwhile
        self.set_U(u[:, :truncated_rank] * s[:truncated_rank])
        self.set_V(vh[:truncated_rank, :])
        return True
