"""Coefficient generators: how matrix entries are produced during assembly.

Reference parity (src/htool/hmatrix/interfaces/virtual_generator.hpp:10-58,
virtual_low_rank_generator.hpp:15-92, virtual_dense_blocks_generator.hpp:11-69):

  * `VirtualGenerator` — subclass and implement `build_submatrix(J, K, mat)`,
    filling `mat` with entries at *user-numbered* rows J / cols K.  This is
    the host-callback compatibility path (the reference pays a Python
    crossing per block too).
  * `VirtualLowRankGenerator` — custom compression hook:
    `build_low_rank_approximation(rows, cols, epsilon) -> bool`, calling
    `set_U`/`set_V`; returning False densifies the block.
  * `VirtualDenseBlocksGenerator` — batched dense-leaf callback:
    `build_dense_blocks(rows_list, cols_list, blocks_list)` receives ALL
    dense leaves at once.

TPU-native fast path: `KernelGenerator` (a jax-traceable kernel f(x, y) over
coordinates) and `MatrixGenerator` (entries gathered from a device array).
These assemble and compress entirely on device, batched per bucket.
"""

from __future__ import annotations

import numpy as np

try:  # device path is optional at import time
    import jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jax = None
    jnp = None


class VirtualGenerator:
    """Host-callback generator (reference-compatible).

    The optional (target_permutation, source_permutation) constructor
    arguments mirror the reference binding signature
    (virtual_generator.hpp:32-47); in this framework cluster permutations
    are always applied by the planner before the callback, so they are
    accepted for API parity and used only to override those permutations.
    """

    is_complex = False

    def __init__(self, target_permutation=None, source_permutation=None):
        self.target_permutation = (
            None if target_permutation is None
            else np.asarray(target_permutation, dtype=np.int64))
        self.source_permutation = (
            None if source_permutation is None
            else np.asarray(source_permutation, dtype=np.int64))

    def build_submatrix(self, J, K, mat) -> None:  # pragma: no cover - abstract
        raise NotImplementedError

    # dtype the assembly should use; complex subclasses may override
    def dtype(self, default):
        return default


class FunctionGenerator(VirtualGenerator):
    """Vectorized host generator from f(J, K) -> (len(J), len(K)) ndarray."""

    def __init__(self, fn, is_complex=False):
        super().__init__()
        self.fn = fn
        self.is_complex = is_complex

    def build_submatrix(self, J, K, mat):
        mat[:, :] = self.fn(np.asarray(J), np.asarray(K))


class MatrixGenerator(VirtualGenerator):
    """Generator backed by an explicit dense matrix (device-capable)."""

    def __init__(self, matrix):
        super().__init__()
        self.matrix = np.asarray(matrix)
        self.is_complex = np.iscomplexobj(self.matrix)
        # materialized EAGERLY: lazily caching inside a trace would cache a
        # tracer (convert_element_type is an op under tracing)
        self._device_matrix = jnp.asarray(self.matrix) if jnp is not None \
            else None

    def build_submatrix(self, J, K, mat):
        mat[:, :] = self.matrix[np.ix_(np.asarray(J), np.asarray(K))]

    # --- device batch interface ---
    # The data arrays travel as DYNAMIC jit arguments (device_operands),
    # never as closure constants: a generator captured as a static jit arg
    # would embed its (N, dim)/(N, N) arrays as HLO literals, which makes
    # XLA constant-fold over them (minutes-long compiles over a remote
    # link) and keys the compilation cache on the DATA instead of the
    # SHAPES (no reuse across geometries / sub-builds).
    def device_operands(self):
        return (self._device_matrix,)

    def device_blocks_ops(self, ops, t_idx, s_idx):
        """t_idx (nb, bt), s_idx (nb, bs) user indices -> (nb, bt, bs)."""
        (a,) = ops
        return a[t_idx[:, :, None], s_idx[:, None, :]]

    def device_rows_ops(self, ops, t_idx, s_idx):
        """t_idx (nb,), s_idx (nb, bs) -> (nb, bs)."""
        (a,) = ops
        return a[t_idx[:, None], s_idx]

    def device_cols_ops(self, ops, t_idx, s_idx):
        """t_idx (nb, bt), s_idx (nb,) -> (nb, bt)."""
        (a,) = ops
        return a[t_idx, s_idx[:, None]]

    # legacy closure-capturing spellings (kept for user code written against
    # them; the assembly fast path prefers the *_ops forms above)
    def device_matrix(self):
        return self._device_matrix

    def device_blocks(self, t_idx, s_idx):
        return self.device_blocks_ops(self.device_operands(), t_idx, s_idx)

    def device_rows(self, t_idx, s_idx):
        return self.device_rows_ops(self.device_operands(), t_idx, s_idx)

    def device_cols(self, t_idx, s_idx):
        return self.device_cols_ops(self.device_operands(), t_idx, s_idx)


class KernelGenerator(VirtualGenerator):
    """TPU-native generator: entries k(x_i, y_j) from a jax-traceable kernel.

    `kernel` maps broadcastable coordinate arrays (..., dim), (..., dim) to
    entry values (...,).  `target_points` / `source_points` are (dim, N)
    like the reference's generators (example/define_generators.py:6-17).
    """

    def __init__(self, kernel, target_points, source_points, is_complex=False):
        super().__init__()
        self.kernel = kernel
        self.target_points = np.asarray(target_points, dtype=np.float64)
        self.source_points = np.asarray(source_points, dtype=np.float64)
        self.is_complex = is_complex
        # materialized EAGERLY (see MatrixGenerator: no caching under trace)
        if jnp is not None:
            self._tx = jnp.asarray(self.target_points.T)  # (N, dim)
            self._sx = jnp.asarray(self.source_points.T)

    def _device_points(self):
        return self._tx, self._sx

    def build_submatrix(self, J, K, mat):
        tx = self.target_points[:, np.asarray(J)].T  # (|J|, dim)
        sx = self.source_points[:, np.asarray(K)].T
        mat[:, :] = np.asarray(self.kernel(tx[:, None, :], sx[None, :, :]))

    # --- device batch interface (see MatrixGenerator: operands are DYNAMIC
    # jit arguments so compiles key on shapes, not point values) ---
    def device_operands(self):
        return (self._tx, self._sx)

    def device_blocks_ops(self, ops, t_idx, s_idx):
        tx, sx = ops
        return self.kernel(tx[t_idx][:, :, None, :], sx[s_idx][:, None, :, :])

    def device_rows_ops(self, ops, t_idx, s_idx):
        tx, sx = ops
        return self.kernel(tx[t_idx][:, None, :], sx[s_idx])

    def device_cols_ops(self, ops, t_idx, s_idx):
        tx, sx = ops
        return self.kernel(tx[t_idx], sx[s_idx][:, None, :])

    def device_blocks(self, t_idx, s_idx):
        return self.device_blocks_ops(self.device_operands(), t_idx, s_idx)

    def device_rows(self, t_idx, s_idx):
        return self.device_rows_ops(self.device_operands(), t_idx, s_idx)

    def device_cols(self, t_idx, s_idx):
        return self.device_cols_ops(self.device_operands(), t_idx, s_idx)


class VirtualLowRankGenerator:
    """Custom low-rank approximation hook (reference:
    virtual_low_rank_generator.hpp:15-92).

    Subclass implements `build_low_rank_approximation(rows, cols, epsilon)`,
    calling `set_U(U)` / `set_V(V)` and returning True, or returning False
    to fall back to dense assembly for that block.  `allow_copy=False` keeps
    numpy ownership on the user side (then `clear_data()` must be called
    once assembly is done) — in this framework data is always copied into
    padded device buffers, so the flag only gates the `clear_data` protocol.
    """

    def __init__(self, allow_copy: bool = True):
        self._allow_copy = allow_copy
        self._U = None
        self._V = None
        self._stored = []

    def build_low_rank_approximation(self, rows, cols, epsilon) -> bool:
        raise NotImplementedError  # pragma: no cover

    def set_U(self, U):
        self._U = np.asarray(U)
        if not self._allow_copy:
            self._stored.append(self._U)

    def set_V(self, V):
        self._V = np.asarray(V)
        if not self._allow_copy:
            self._stored.append(self._V)

    def clear_data(self):
        self._stored.clear()

    def take_uv(self):
        U, V = self._U, self._V
        self._U = None
        self._V = None
        return U, V


class VirtualDenseBlocksGenerator:
    """Batched dense-leaf callback (reference:
    virtual_dense_blocks_generator.hpp:11-69): all admissible-dense leaves
    are handed to Python in ONE call for vectorized user assembly."""

    def __init__(self, target_cluster=None, source_cluster=None):
        self.target_cluster = target_cluster
        self.source_cluster = source_cluster

    def build_dense_blocks(self, rows_offsets, cols_offsets, blocks) -> None:
        raise NotImplementedError  # pragma: no cover
