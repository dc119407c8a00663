"""Kernel generators for the examples.

Two tiers, matching the framework's two assembly paths:

* `CustomGenerator` — the host `VirtualGenerator` escape hatch (reference
  example/define_generators.py contract: build_submatrix fills an F-ordered
  block at user-numbered indices).  Vectorized numpy instead of the
  reference's per-entry loops; also provides the brute-force mat_vec /
  mat_mat oracles used to check accuracy.
* `make_device_generator` — the TPU-native path: a traced jax kernel
  evaluated on device in batched tiles during assembly (no per-block Python
  callbacks — the shape the reference only hints at with its batched
  VirtualDenseBlocksGenerator).
"""

import numpy as np

import htool_python_tpu as H
from htool_python_tpu.models.kernels import inverse_distance_kernel


class CustomGenerator(H.VirtualGenerator):
    def __init__(self, target_points, source_points):
        super().__init__()
        self.target_points = np.asarray(target_points)
        self.source_points = np.asarray(source_points)
        self.nb_rows = self.target_points.shape[1]
        self.nb_cols = self.source_points.shape[1]

    def _block(self, J, K):
        t = self.target_points[:, np.asarray(J)]
        s = self.source_points[:, np.asarray(K)]
        d = np.linalg.norm(t[:, :, None] - s[:, None, :], axis=0)
        return 1.0 / (1e-1 + d)

    def get_coef(self, i, j):
        return float(self._block([i], [j])[0, 0])

    def build_submatrix(self, J, K, mat):
        mat[:, :] = self._block(J, K)

    def mat_vec(self, x):
        return self._block(np.arange(self.nb_rows),
                           np.arange(self.nb_cols)) @ x

    def mat_mat(self, X):
        return self._block(np.arange(self.nb_rows),
                           np.arange(self.nb_cols)) @ X


def make_device_generator(target_points, source_points):
    """TPU-native generator: kernel entries are computed on device in
    batched tiles (assembly never crosses back into Python per block)."""
    return H.KernelGenerator(inverse_distance_kernel(1e-1),
                             np.asarray(target_points),
                             np.asarray(source_points))
