"""Post-assembly rank re-truncation.

Reference parity: module-level `recompression(hmatrix)` and
`openmp_recompression(hmatrix)` (src/htool/hmatrix/hmatrix.hpp:96-99).
Note the reference quirk: the no-callback `openmp_recompression` binding
calls the serial recompression (hmatrix.hpp:99); here both names run the
same batched device kernel (which is already parallel on TPU).
Mutates the HMatrix in place, like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.aca import batched_truncate


def recompression(hmatrix, epsilon: float | None = None) -> None:
    if isinstance(hmatrix, (list, tuple)):  # PerPartition container
        for h in hmatrix:
            recompression(h, epsilon)
        return
    eps = float(epsilon) if epsilon is not None else hmatrix.epsilon
    lr_arrays, lr_ranks = [], []
    for (Ut, V, *_), b, ranks in zip(hmatrix._data["lr"],
                                     hmatrix.plan.lowrank_buckets,
                                     hmatrix._lr_ranks):
        # storage is rank-major Ut (nb, r, pt); truncate in (nb, pt, r)
        U2, V2, r2 = batched_truncate(jnp.swapaxes(jnp.asarray(Ut), 1, 2),
                                      jnp.asarray(V),
                                      jnp.asarray(ranks), eps)
        r2 = np.asarray(r2)
        rmax = max(int(r2.max()) if len(r2) else 1, 1)
        lr_arrays.append((U2[:, :, :rmax], V2[:, :rmax, :]))
        lr_ranks.append(r2)
    hmatrix._set_lr_arrays(lr_arrays, lr_ranks)


def openmp_recompression(hmatrix, epsilon: float | None = None) -> None:
    recompression(hmatrix, epsilon)
