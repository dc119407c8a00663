"""Krylov solvers: restarted right-preconditioned GMRES and CG.

TPU-native replacement for the HPDDM iterative layer the reference links
(SURVEY.md §2.2 row HPDDM; flags at tests/test_ddm_solver.py:548-558).
The operator and preconditioner callbacks are device computations (H-matrix
products, batched subdomain solves); the Krylov recurrences (small Hessenberg
updates, Givens rotations) are cheap host work.  Multi-RHS (`mu`) solves run
column-blocked.
"""

from __future__ import annotations

import numpy as np


def _norm(v):
    return float(np.linalg.norm(v))


def gmres(A, b, x0=None, M=None, tol=1e-6, max_it=100, restart=40,
          verbosity=0):
    """Right-preconditioned restarted GMRES for one RHS.

    A, M: callables v -> A@v, v -> M^{-1}@v (M=None => identity).
    Returns (x, info) with info = {'niter', 'residual', 'converged'}.
    """
    b = np.asarray(b)
    n = len(b)
    dtype = np.result_type(b.dtype, np.asarray(A(np.zeros_like(b))).dtype)
    x = np.zeros(n, dtype=dtype) if x0 is None else np.asarray(x0).astype(dtype)
    Mi = (lambda v: v) if M is None else M
    bnorm = _norm(b)
    if bnorm == 0:
        return np.zeros(n, dtype=dtype), {"niter": 0, "residual": 0.0,
                                          "converged": True}
    restart = max(1, min(restart, max_it))
    total_it = 0
    while total_it < max_it:
        r = b - np.asarray(A(x))
        beta = _norm(r)
        if beta / bnorm < tol:
            return x, {"niter": total_it, "residual": beta / bnorm,
                       "converged": True}
        m = min(restart, max_it - total_it)
        V = np.zeros((m + 1, n), dtype=dtype)
        H = np.zeros((m + 1, m), dtype=dtype)
        cs = np.zeros(m, dtype=dtype)
        sn = np.zeros(m, dtype=dtype)
        g = np.zeros(m + 1, dtype=dtype)
        V[0] = r / beta
        g[0] = beta
        j_done = 0
        for j in range(m):
            w = np.asarray(A(Mi(V[j])), dtype=dtype)
            # modified Gram-Schmidt
            for i in range(j + 1):
                H[i, j] = np.vdot(V[i], w)
                w = w - H[i, j] * V[i]
            H[j + 1, j] = _norm(w)
            if H[j + 1, j].real > 1e-300:
                V[j + 1] = w / H[j + 1, j]
            # apply accumulated Givens rotations
            for i in range(j):
                t = cs[i] * H[i, j] + sn[i] * H[i + 1, j]
                H[i + 1, j] = -np.conj(sn[i]) * H[i, j] + cs[i] * H[i + 1, j]
                H[i, j] = t
            # new rotation
            # complex Givens (LAPACK lartg convention):
            # [c, s; -conj(s), c] [a; b] = [r; 0], c real, s = c*conj(b/a)
            denom = np.sqrt(abs(H[j, j]) ** 2 + abs(H[j + 1, j]) ** 2)
            if denom == 0:
                cs[j], sn[j] = 1.0, 0.0
            elif abs(H[j, j]) == 0:
                cs[j], sn[j] = 0.0, 1.0
            else:
                cs[j] = abs(H[j, j]) / denom
                sn[j] = cs[j] * np.conj(H[j + 1, j] / H[j, j])
            t = cs[j] * g[j]
            g[j + 1] = -np.conj(sn[j]) * g[j]
            g[j] = t
            H[j, j] = cs[j] * H[j, j] + sn[j] * H[j + 1, j]
            H[j + 1, j] = 0.0
            j_done = j + 1
            total_it += 1
            res_est = abs(g[j + 1]) / bnorm
            if verbosity:
                print(f"GMRES it {total_it}: residual estimate {res_est:.3e}")
            if res_est < tol:
                break
        # solve the small triangular system and update
        y = np.zeros(j_done, dtype=dtype)
        for i in range(j_done - 1, -1, -1):
            y[i] = (g[i] - H[i, i + 1:j_done] @ y[i + 1:]) / H[i, i]
        x = x + np.asarray(Mi(V[:j_done].T @ y))
    r = b - np.asarray(A(x))
    res = _norm(r) / bnorm
    return x, {"niter": total_it, "residual": res, "converged": res < tol}


def cg(A, b, x0=None, M=None, tol=1e-6, max_it=100, verbosity=0):
    """Preconditioned conjugate gradient (SPD operators)."""
    b = np.asarray(b)
    n = len(b)
    dtype = b.dtype
    x = np.zeros(n, dtype=dtype) if x0 is None else np.asarray(x0).astype(dtype)
    Mi = (lambda v: v) if M is None else M
    bnorm = _norm(b)
    if bnorm == 0:
        return np.zeros(n, dtype=dtype), {"niter": 0, "residual": 0.0,
                                          "converged": True}
    r = b - np.asarray(A(x))
    z = np.asarray(Mi(r))
    p = z.copy()
    rz = np.vdot(r, z)
    it = 0
    while it < max_it:
        if _norm(r) / bnorm < tol:
            break
        Ap = np.asarray(A(p))
        alpha = rz / np.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = np.asarray(Mi(r))
        rz_new = np.vdot(r, z)
        p = z + (rz_new / rz) * p
        rz = rz_new
        it += 1
        if verbosity:
            print(f"CG it {it}: residual {_norm(r) / bnorm:.3e}")
    res = _norm(b - np.asarray(A(x))) / bnorm
    return x, {"niter": it, "residual": res, "converged": res < tol}
