"""Krylov solvers: restarted right-preconditioned GMRES and CG.

TPU-native replacement for the HPDDM iterative layer the reference links
(SURVEY.md §2.2 row HPDDM; flags at tests/test_ddm_solver.py:548-558).

Two tiers:

* `gmres_device` / `cg_device` — the production path.  The whole recurrence
  (Arnoldi/CGS2 orthogonalization, Givens rotations, residual estimates,
  solution update) runs as ONE jitted device program per restart cycle with
  the Krylov basis resident in device memory; every right-hand side column
  marches in lockstep (blocked multi-RHS), with per-column convergence and
  breakdown masking inside the loop.  The host reads back only k convergence
  flags per restart cycle — no per-iteration host<->device transfer of O(N)
  data (the reference runs its whole loop inside HPDDM for the same reason,
  src/htool/solver/solver.hpp:22-61).
* `gmres` / `cg` — host fallbacks used when the operator or preconditioner
  is a user Python callback that cannot be traced (the reference's custom
  local-operator escape hatch).
"""

from __future__ import annotations

import weakref
from functools import partial

import numpy as np

from ..utils.complex_io import to_device, to_host

# Compiled-cycle cache keyed on the OPERATOR's identity: rebuilding the
# cycle closure per solve() call forces jax to re-trace (and reload from
# the compilation cache over the remote link) the entire restart-cycle
# program each time — measured ~20 s per ddm_gmres solve at N=20000 where
# the cycle EXECUTION is ~0.1 s.  Callers that pass the same A_fn/M_fn
# objects (DDMSolver caches its solver surfaces; DistributedOperator
# memoizes build_device_apply) reuse the compiled cycle across solves.
_CYCLE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _cached_program(A_fn, M_fn, key, build):
    try:
        per = _CYCLE_CACHE.setdefault(A_fn, {})
    except TypeError:  # non-weakref-able operator: no caching
        return build()
    ent = per.get(key)
    # the stored strong M_fn reference makes the identity check sound
    # (a GC'd M_fn cannot alias a live one)
    if ent is None or ent[0] is not M_fn:
        ent = (M_fn, build())
        per[key] = ent
    return ent[1]


def _norm(v):
    return float(np.linalg.norm(v))


# ======================================================================
# Device-resident solvers
# ======================================================================

def _cols_norm(w):
    """Column 2-norms of (n, k): returns real (k,)."""
    import jax.numpy as jnp
    return jnp.sqrt(jnp.sum(jnp.abs(w) ** 2, axis=0))


@partial(lambda f: f)  # keep a plain def; jit happens per-shape below
def _noop(x):
    return x


def _bind_operator(fn):
    """Normalize an operator for the jitted device solvers.

    A plain callable x -> y is closed over by the cycle jit; that is fine
    single-process, but a MULTI-PROCESS global array (sharded over
    non-addressable devices) cannot be a jit closure constant — jax
    requires it as an argument.  Operators that carry such state declare
    it via an `operands` attribute and accept (operands, x).

    Returns (call(ops, x), ops)."""
    if fn is None:
        return None, ()
    ops = getattr(fn, "operands", None)
    if ops is None:
        return (lambda _o, x: fn(x)), ()
    return (lambda o, x: fn(o, x)), ops


def compose_operators(outer, inner):
    """x -> outer(inner(x)) preserving the `operands` protocol: the composed
    callable's operands are the pair of both operators' operand pytrees, so
    neither one's device state becomes a jit closure constant."""
    o_call, o_ops = _bind_operator(outer)
    i_call, i_ops = _bind_operator(inner)

    def fn(*args):
        if len(args) == 1:
            (oo, io), x = (o_ops, i_ops), args[0]
        else:
            (oo, io), x = args
        return o_call(oo, i_call(io, x))

    fn.operands = (o_ops, i_ops)
    return fn


def _make_gmres_cycle(A_fn, M_fn, m: int, max_it: int):
    """Build the jitted restart-cycle: m inner iterations with per-column
    active masking.  State layout (k = number of RHS columns):
      V  (m+1, n, k)  Krylov basis        H (m+1, m, k) rotated Hessenberg
      cs (m, k) real  sn (m, k)           g (m+1, k) rotated rhs
      conv (k,) bool  niter (k,) int32
    H is initialized to the identity in its top (m, m) part so the final
    batched triangular solve is valid for columns that stopped early."""
    import jax
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    A_call, _ = _bind_operator(A_fn)
    M_call, _ = _bind_operator(M_fn if M_fn is not None else _noop)

    @jax.jit
    def cycle(a_ops, m_ops, x, b, bnorm, conv_in, niter_in, it_start, tol):
        A_fn = lambda v: A_call(a_ops, v)
        Mi = lambda v: M_call(m_ops, v)
        n, k = x.shape
        dtype = x.dtype
        rdtype = jnp.zeros((), dtype).real.dtype
        r = b - A_fn(x)
        beta = _cols_norm(r)  # (k,) real
        conv0 = conv_in | (beta <= tol * bnorm)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((m + 1, n, k), dtype=dtype)
        V = V.at[0].set(jnp.where(conv0[None, :], 0.0,
                                  r / safe_beta[None, :].astype(dtype)))
        H = jnp.zeros((m + 1, m, k), dtype=dtype)
        H = H.at[jnp.arange(m), jnp.arange(m)].set(1.0)
        cs = jnp.zeros((m, k), dtype=rdtype)
        sn = jnp.zeros((m, k), dtype=dtype)
        g = jnp.zeros((m + 1, k), dtype=dtype)
        g = g.at[0].set(jnp.where(conv0, 0.0, beta.astype(dtype)))
        # NaN-init: rows for iterations that never ran stay all-NaN so the
        # verbose filter skips them (instead of printing spurious 0.0 lines)
        res_hist = jnp.full((m, k), jnp.nan, dtype=rdtype)
        brk0 = jnp.zeros((k,), dtype=bool)

        iarange = jnp.arange(m + 1)

        def body(carry):
            j, V, H, cs, sn, g, conv, brk, niter, res_hist = carry
            active = (~conv) & (~brk) & (it_start + j < max_it)  # (k,)
            am = active[None, :]
            w = A_fn(Mi(V[j]))  # (n, k)
            # CGS2: classical Gram-Schmidt with one reorthogonalization —
            # both passes are single batched (m+1, n, k) contractions (MXU
            # friendly), numerically equivalent to MGS
            mask_i = (iarange <= j)[:, None].astype(w.real.dtype)  # (m+1, 1)
            h1 = jnp.einsum("ink,nk->ik", jnp.conj(V), w) * mask_i
            w = w - jnp.einsum("ink,ik->nk", V, h1)
            h2 = jnp.einsum("ink,nk->ik", jnp.conj(V), w) * mask_i
            w = w - jnp.einsum("ink,ik->nk", V, h2)
            hcol = h1 + h2  # (m+1, k)
            hj1 = _cols_norm(w)  # (k,) real
            tiny = jnp.asarray(np.finfo(np.dtype(rdtype)).tiny * 16,
                               dtype=rdtype)
            grow = hj1 > tiny
            vnext = jnp.where((active & grow)[None, :],
                              w / jnp.where(grow, hj1, 1.0)[None, :]
                              .astype(dtype), 0.0)
            V = V.at[j + 1].set(vnext)

            # apply accumulated Givens rotations to the new column
            def rot(i, hc):
                t1 = cs[i] * hc[i] + sn[i] * hc[i + 1]
                t2 = -jnp.conj(sn[i]) * hc[i] + cs[i] * hc[i + 1]
                hc = hc.at[i].set(t1)
                return hc.at[i + 1].set(t2)
            hcol = jax.lax.fori_loop(0, j, rot, hcol)
            # new rotation (LAPACK lartg convention: c real)
            a = hcol[j]
            babs = hj1  # real >= 0 by construction
            denom = jnp.sqrt(jnp.abs(a) ** 2 + babs ** 2)
            c_new = jnp.where(denom > 0, jnp.abs(a) / jnp.where(
                denom > 0, denom, 1.0), 1.0)
            c_new = jnp.where((jnp.abs(a) == 0) & (babs > 0), 0.0, c_new)
            s_new = jnp.where(
                jnp.abs(a) > 0,
                c_new.astype(dtype) * jnp.conj(
                    babs.astype(dtype) / jnp.where(jnp.abs(a) > 0, a, 1.0)),
                jnp.where(babs > 0, jnp.ones((), dtype), jnp.zeros((), dtype)))
            g_j = c_new.astype(dtype) * g[j]
            g_j1 = -jnp.conj(s_new) * g[j]
            h_jj = c_new.astype(dtype) * a + s_new * babs.astype(dtype)
            hcol = hcol.at[j].set(h_jj)
            hcol = hcol.at[j + 1].set(0.0)

            H = H.at[:, j].set(jnp.where(am, hcol, H[:, j]))
            cs = cs.at[j].set(jnp.where(active, c_new, cs[j]))
            sn = sn.at[j].set(jnp.where(active, s_new, sn[j]))
            g = g.at[j].set(jnp.where(active, g_j, g[j]))
            g = g.at[j + 1].set(jnp.where(active, g_j1, g[j + 1]))
            res = jnp.abs(g[j + 1]) / jnp.where(bnorm > 0, bnorm, 1.0)
            res_hist = res_hist.at[j].set(jnp.where(active, res, jnp.nan))
            niter = niter + active.astype(niter.dtype)
            conv = conv | (active & (res <= tol))
            # breakdown without convergence (orthogonality loss / stagnant
            # basis): stop THIS cycle for the column but do NOT flag it
            # converged — the caller restarts it from the updated x with a
            # fresh residual next cycle (brk resets every cycle)
            brk = brk | (active & ~grow & ~conv)
            return j + 1, V, H, cs, sn, g, conv, brk, niter, res_hist

        def cond(carry):
            j, V, H, cs, sn, g, conv, brk, niter, res_hist = carry
            # early exit once every column is converged (or out of budget):
            # masked no-op iterations would still pay full operator applies
            return (j < m) & ~jnp.all(conv | brk | (it_start + j >= max_it))

        carry = (jnp.zeros((), jnp.int32), V, H, cs, sn, g, conv0, brk0,
                 niter_in, res_hist)
        _, V, H, cs, sn, g, conv, brk, niter, res_hist = jax.lax.while_loop(
            cond, body, carry)
        # batched back-substitution: columns that never ran keep identity
        # diagonal + zero rhs => zero update.  g[j_done] holds the
        # least-squares residual remainder, NOT part of the system — zero
        # every row >= the column's active-iteration count
        done_this = niter - niter_in  # (k,)
        gsys = g[:m] * (jnp.arange(m)[:, None] < done_this[None, :])
        R = jnp.moveaxis(H[:m], -1, 0)  # (k, m, m) upper triangular
        gk = jnp.moveaxis(gsys, -1, 0)[..., None]  # (k, m, 1)
        y = jsl.solve_triangular(R, gk, lower=False)[..., 0]  # (k, m)
        dx = jnp.einsum("jnk,kj->nk", V[:m], y)
        x = x + Mi(dx)
        return x, conv, niter, res_hist

    return cycle


def gmres_device(A_fn, b, M_fn=None, tol=1e-6, max_it=100, restart=40,
                 verbosity=0, dtype=None):
    """Blocked-RHS restarted right-preconditioned GMRES, device-resident.

    A_fn, M_fn: traceable (n, k) -> (n, k) device computations.
    b: (n,) or (n, k).  Returns (x (n, k) jax array, info dict with
    per-column 'niter' (k,), 'residual' (k,), 'converged' (k,))."""
    import jax
    import jax.numpy as jnp

    b = to_device(b)
    squeeze = b.ndim == 1
    b2 = b[:, None] if squeeze else b
    if dtype is not None:
        b2 = b2.astype(dtype)
    n, k = b2.shape
    bnorm = _cols_norm(b2)
    restart = max(1, min(int(restart), int(max_it)))
    cycle = _cached_program(
        A_fn, M_fn, ("gmres", restart, int(max_it)),
        lambda: _make_gmres_cycle(A_fn, M_fn, restart, int(max_it)))
    A_call, a_ops = _bind_operator(A_fn)
    _, m_ops = _bind_operator(M_fn if M_fn is not None else _noop)

    x = jnp.zeros_like(b2)
    conv = jnp.zeros((k,), dtype=bool)
    niter = jnp.zeros((k,), dtype=jnp.int32)
    tol_arr = jnp.asarray(tol, dtype=bnorm.dtype)
    total = 0
    while total < max_it:
        x, conv, niter, res_hist = cycle(a_ops, m_ops, x, b2, bnorm, conv,
                                         niter,
                                         jnp.asarray(total, jnp.int32),
                                         tol_arr)
        if verbosity:
            hist = np.asarray(res_hist)
            base = total
            for j in range(hist.shape[0]):
                row = hist[j]
                if np.all(np.isnan(row)):
                    continue
                print(f"GMRES it {base + j + 1}: residual estimate "
                      f"{np.nanmax(row):.3e}")
        total += restart
        if bool(jnp.all(conv)):
            break
    r = b2 - A_call(a_ops, x)
    res = np.asarray(_cols_norm(r) / np.where(np.asarray(bnorm) > 0,
                                              np.asarray(bnorm), 1.0))
    info = {"niter": np.asarray(niter), "residual": res,
            "converged": res <= tol}
    return (x[:, 0] if squeeze else x), info


def cg_device(A_fn, b, M_fn=None, tol=1e-6, max_it=100, verbosity=0,
              dtype=None):
    """Blocked-RHS preconditioned CG, fully device-resident
    (`lax.while_loop`, per-column convergence masking)."""
    import jax
    import jax.numpy as jnp

    b = to_device(b)
    squeeze = b.ndim == 1
    b2 = b[:, None] if squeeze else b
    if dtype is not None:
        b2 = b2.astype(dtype)
    A_call, a_ops = _bind_operator(A_fn)
    M_call, m_ops = _bind_operator(M_fn if M_fn is not None else _noop)
    bnorm = _cols_norm(b2)
    tol_arr = jnp.asarray(tol, dtype=bnorm.dtype)

    @jax.jit
    def _cg_run(a_ops, m_ops, b2, bnorm, tol_arr):
        A_fn = lambda v: A_call(a_ops, v)
        Mi = lambda v: M_call(m_ops, v)
        x0 = jnp.zeros_like(b2)
        r0 = b2 - A_fn(x0)
        z0 = Mi(r0)
        p0 = z0
        rz0 = jnp.sum(jnp.conj(r0) * z0, axis=0)  # (k,)
        conv0 = _cols_norm(r0) <= tol_arr * bnorm
        it0 = jnp.zeros((), jnp.int32)
        niter0 = jnp.zeros((b2.shape[1],), jnp.int32)

        def cond(c):
            x, r, z, p, rz, conv, it, niter = c
            return (it < max_it) & ~jnp.all(conv)

        def body(c):
            x, r, z, p, rz, conv, it, niter = c
            active = ~conv
            Ap = A_fn(p)
            pAp = jnp.sum(jnp.conj(p) * Ap, axis=0)
            alpha = jnp.where(active & (jnp.abs(pAp) > 0),
                              rz / jnp.where(jnp.abs(pAp) > 0, pAp, 1.0), 0.0)
            x = x + alpha[None, :] * p
            r = r - alpha[None, :] * Ap
            z = Mi(r)
            rz_new = jnp.sum(jnp.conj(r) * z, axis=0)
            beta = jnp.where(active & (jnp.abs(rz) > 0),
                             rz_new / jnp.where(jnp.abs(rz) > 0, rz, 1.0), 0.0)
            p = jnp.where(active[None, :], z + beta[None, :] * p, p)
            rz = jnp.where(active, rz_new, rz)
            niter = niter + active.astype(niter.dtype)
            conv = conv | (_cols_norm(r) <= tol_arr * bnorm)
            return x, r, z, p, rz, conv, it + 1, niter

        c = jax.lax.while_loop(cond, body,
                               (x0, r0, z0, p0, rz0, conv0, it0, niter0))
        return c[0], c[5], c[7]

    run = _cached_program(A_fn, M_fn, ("cg", int(max_it)), lambda: _cg_run)
    x, conv, niter = run(a_ops, m_ops, b2, bnorm, tol_arr)
    r = b2 - A_call(a_ops, x)
    res = np.asarray(_cols_norm(r) / np.where(np.asarray(bnorm) > 0,
                                              np.asarray(bnorm), 1.0))
    if verbosity:
        print(f"CG finished after {int(np.max(np.asarray(niter)))} its: "
              f"residual {float(np.max(res)):.3e}")
    info = {"niter": np.asarray(niter), "residual": res,
            "converged": res <= tol}
    return (x[:, 0] if squeeze else x), info


# ======================================================================
# Host fallbacks (custom Python operators / preconditioners)
# ======================================================================

def gmres(A, b, x0=None, M=None, tol=1e-6, max_it=100, restart=40,
          verbosity=0):
    """Right-preconditioned restarted GMRES for one RHS (host recurrences).

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
        breakdown = False
        for j in range(m):
            w = np.asarray(A(Mi(V[j])), dtype=dtype)
            # modified Gram-Schmidt
            for i in range(j + 1):
                H[i, j] = np.vdot(V[i], w)
                w = w - H[i, j] * V[i]
            H[j + 1, j] = _norm(w)
            breakdown = not (H[j + 1, j].real > np.finfo(
                np.dtype(dtype).type(0).real.dtype).tiny * 16)
            if not breakdown:
                V[j + 1] = w / H[j + 1, j]
            # apply accumulated Givens rotations
            for i in range(j):
                t = cs[i] * H[i, j] + sn[i] * H[i + 1, j]
                H[i + 1, j] = -np.conj(sn[i]) * H[i, j] + cs[i] * H[i + 1, j]
                H[i, j] = t
            # new rotation (LAPACK lartg convention: c real,
            # s = c*conj(b/a))
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
            if res_est < tol or breakdown:
                # happy breakdown: the exact solution lies in the current
                # space; never orthogonalize against a zero basis vector
                break
        # solve the small triangular system and update
        y = np.zeros(j_done, dtype=dtype)
        for i in range(j_done - 1, -1, -1):
            y[i] = (g[i] - H[i, i + 1:j_done] @ y[i + 1:]) / H[i, i]
        x = x + np.asarray(Mi(V[:j_done].T @ y))
        # breakdown without convergence (orthogonality loss): restart from
        # the updated x with a fresh residual rather than giving up — the
        # loop stays bounded because every inner pass advances total_it.
        # (A *happy* breakdown exits via the residual check at loop top.)
    r = b - np.asarray(A(x))
    res = _norm(r) / bnorm
    return x, {"niter": total_it, "residual": res, "converged": res < tol}


def cg(A, b, x0=None, M=None, tol=1e-6, max_it=100, verbosity=0):
    """Preconditioned conjugate gradient (SPD operators), host recurrences."""
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
