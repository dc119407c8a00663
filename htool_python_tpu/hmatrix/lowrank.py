"""Low-rank UV^T factor pair handle.

Reference parity: `LowRankMatrix` / `ComplexLowRankMatrix`
(src/htool/hmatrix/lrmat.hpp:11-18): nb_rows / nb_cols / rank accessors.
"""

from __future__ import annotations

import numpy as np


class LowRankMatrix:
    def __init__(self, U, V, epsilon=None):
        self.U = np.asarray(U)
        self.V = np.asarray(V)
        self.epsilon = epsilon

    def nb_rows(self) -> int:
        return self.U.shape[0]

    def nb_cols(self) -> int:
        return self.V.shape[1]

    def rank_of(self) -> int:
        return self.U.shape[1]

    # pythonic aliases
    @property
    def rank(self) -> int:
        return self.rank_of()

    @property
    def shape(self):
        return (self.nb_rows(), self.nb_cols())

    def to_dense(self) -> np.ndarray:
        return self.U @ self.V
