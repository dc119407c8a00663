"""H-matrix factorizations: LU and Cholesky, plus triangular solves.

Reference parity: `lu_factorization` / `lu_solve(trans, b)` /
`cholesky_factorization(UPLO)` / `cholesky_solve(UPLO, b)`
(src/htool/hmatrix/hmatrix.hpp:58-94).  Contract pinned by
tests/test_hmatrix.py:98-128: factorizing an epsilon-compressed matrix
solves to relative error < epsilon; factorization is in-place (deepcopy
first).

Two execution paths, selected by size:
- n <= config.hodlr_threshold: densify-and-factor on device (jax.scipy
  LU / Cholesky) — numerically exact, the right call for small blocks.
- larger: the level-batched hierarchical HODLR Woodbury factorization
  (ops/hodlr.py), O(N r log^2 N) build / O(N r log N) solve, constructed
  by randomized peeling through the operator's own fast bucketed matvec.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..config import get_config
from ..utils.complex_io import to_device, to_host


def _hierarchical_factor(hmatrix, sym: str = "N"):
    from ..ops.hodlr import build_hodlr, factor_hodlr

    cfg = get_config()
    n = hmatrix.shape[0]
    eps = max(hmatrix.epsilon * cfg.hodlr_eps_factor, 1e-14)

    # randomized peeling widens its probe batches adaptively (up to
    # config.hodlr_max_sample_size columns); apply in bounded column
    # chunks — the XLA product path materializes (nb, width, k) gathered
    # segments per bucket, which at k ~ 1024 is GBs of transient memory
    chunk = 128

    def apply_fn(x, trans):
        x = jnp.asarray(x)
        if x.shape[1] <= chunk:
            return hmatrix._apply_internal_2d(x, trans)
        outs = [hmatrix._apply_internal_2d(x[:, i:i + chunk], trans)
                for i in range(0, x.shape[1], chunk)]
        return jnp.concatenate(outs, axis=1)

    h = build_hodlr(apply_fn, n, hmatrix.dtype, eps,
                    leaf_size=cfg.hodlr_leaf_size,
                    sample_size=cfg.hodlr_sample_size,
                    power_iters=cfg.hodlr_power_iters,
                    sym=sym)
    return factor_hodlr(h)


def lu_factorization(hmatrix) -> None:
    n, nc = hmatrix.shape
    if n != nc:
        raise ValueError("lu_factorization requires a square H-matrix")
    if n > get_config().hodlr_threshold:
        from ..ops.hodlr import HODLRRankSaturationError
        try:
            hmatrix._factorization = ("hodlr", _hierarchical_factor(hmatrix))
            return
        except HODLRRankSaturationError as e:
            from ..utils.logger import get_logger
            get_logger().warning(
                "%s; falling back to the dense LU path (O(n^2) memory)", e)
    a = to_device(hmatrix.to_dense())
    lu, piv = jsl.lu_factor(a)
    hmatrix._factorization = ("lu", lu, piv)


def cholesky_factorization(hmatrix, UPLO: str = "L") -> None:
    n, nc = hmatrix.shape
    if n != nc:
        raise ValueError("cholesky_factorization requires a square H-matrix")
    if n > get_config().hodlr_threshold:
        from ..ops.hodlr import HODLRRankSaturationError
        # symmetric HODLR-Woodbury: sample one triangle, mirror the factors
        sym = "H" if np.issubdtype(hmatrix.dtype, np.complexfloating) else "S"
        try:
            hmatrix._factorization = ("hodlr",
                                      _hierarchical_factor(hmatrix, sym=sym))
            return
        except HODLRRankSaturationError as e:
            from ..utils.logger import get_logger
            get_logger().warning(
                "%s; falling back to the dense Cholesky path "
                "(O(n^2) memory)", e)
    a = to_device(hmatrix.to_dense())
    c = jsl.cholesky(a, lower=(UPLO == "L"))
    hmatrix._factorization = ("cholesky", c, UPLO)


def _solve_internal(hmatrix, trans: str, b_int):
    if hmatrix._factorization is None:
        raise RuntimeError("call lu_factorization / cholesky_factorization first")
    kind = hmatrix._factorization[0]
    squeeze = b_int.ndim == 1
    b2 = b_int[:, None] if squeeze else b_int
    if kind == "lu":
        _, lu, piv = hmatrix._factorization
        t = {"N": 0, "T": 1, "C": 2}[trans]
        x = jsl.lu_solve((lu, piv), to_device(b2), trans=t)
    elif kind == "hodlr":
        import logging

        from ..ops.hodlr import hodlr_solve
        from ..utils.logger import get_logger
        _, fact = hmatrix._factorization
        b_dev = to_device(b2)
        x = hodlr_solve(fact, b_dev, trans)
        log = get_logger()
        debug = log.isEnabledFor(logging.DEBUG)
        res0 = None
        for i in range(get_config().hodlr_refine_iters):
            r = b_dev - hmatrix._apply_internal_2d(x, trans)
            if debug and i == 0:
                res0 = float(jnp.linalg.norm(r) / jnp.linalg.norm(b_dev))
            x = x + hodlr_solve(fact, r, trans)
        if debug and res0 is not None:
            rf = b_dev - hmatrix._apply_internal_2d(x, trans)
            resf = float(jnp.linalg.norm(rf) / jnp.linalg.norm(b_dev))
            if res0 > 10 * hmatrix.epsilon > resf:
                log.debug(
                    "HODLR solve: raw factorization residual %.2e exceeded "
                    "epsilon=%.0e; iterative refinement carried it to %.2e",
                    res0, hmatrix.epsilon, resf)
    else:
        _, c, UPLO = hmatrix._factorization
        lower = UPLO == "L"
        # A = L L^H (lower) or U^H U (upper)
        if lower:
            y = jsl.solve_triangular(c, to_device(b2), lower=True)
            x = jsl.solve_triangular(c.conj().T, y, lower=False)
        else:
            y = jsl.solve_triangular(c.conj().T, to_device(b2), lower=True)
            x = jsl.solve_triangular(c, y, lower=False)
    x = to_host(x)
    return x[:, 0] if squeeze else x


def _user_solve(hmatrix, trans: str, b):
    """Solve in user numbering for root H-matrices (what `lu_solve` returns,
    hmatrix.hpp:64-78); sub-block H-matrices solve in internal numbering."""
    b = np.asarray(b)
    n = hmatrix.plan.nb_rows
    if len(b) != n:
        raise ValueError(
            f"rhs has {len(b)} rows; factorized operator expects {n}")
    if not hmatrix.is_root():
        return _solve_internal(hmatrix, trans, b)
    p = hmatrix.plan
    perm_t = p.target_root.get_permutation()
    perm_s = p.source_root.get_permutation()
    perm_in = perm_t if trans == "N" else perm_s
    perm_out = perm_s if trans == "N" else perm_t
    b_int = b[perm_in]
    x_int = _solve_internal(hmatrix, trans, b_int)
    x = np.empty_like(x_int)
    x[perm_out] = x_int
    return x


def lu_solve(hmatrix, trans: str, b):
    # reference signature is (trans char, rhs) — hmatrix.hpp:64; a clear
    # error here beats the numpy truth-value failure a swapped call hits
    if not isinstance(trans, str) or trans not in ("N", "T", "C"):
        raise ValueError(
            f"lu_solve(trans, b): trans must be 'N', 'T' or 'C', got "
            f"{trans!r}")
    return _user_solve(hmatrix, trans, b)


def cholesky_solve(hmatrix, UPLO: str, b):
    if not isinstance(UPLO, str) or UPLO not in ("L", "U"):
        raise ValueError(
            f"cholesky_solve(UPLO, b): UPLO must be 'L' or 'U', got "
            f"{UPLO!r}")
    return _user_solve(hmatrix, "N", b)
