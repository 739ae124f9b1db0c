"""Matrix-free Krylov solvers in JAX (replaces PETSc KSP + MUMPS,
SURVEY.md §2.2: solveKSP utils_dolfinx.py:470, solveKSP_mumps :495).

All state lives in HBM; the loop is a `lax.while_loop` so the whole solve
compiles into one XLA program with zero host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _identity(x):
    return x


def cg_solve(matvec, b, x0=None, M=None, tol=1e-10, atol=0.0, maxiter=1000):
    """Preconditioned conjugate gradient.

    Returns (x, info) with info = dict(iters, resnorm, converged). matvec and
    M are functions v -> Av / M^{-1}v (M is the preconditioner application).
    """
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.linalg.norm(b)
    target = jnp.maximum(tol * bnorm, atol)

    r0 = b - matvec(x0)
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)

    def cond(state):
        x, r, z, p, rz, k = state
        return jnp.logical_and(jnp.linalg.norm(r) > target, k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, z, p, rz, k = jax.lax.while_loop(cond, body, (x0, r0, z0, p0, rz0, 0))
    resnorm = jnp.linalg.norm(r)
    info = {
        "iters": k,
        "resnorm": resnorm,
        "converged": resnorm <= jnp.maximum(target, 1e-300),
    }
    return x, info


def gmres_solve(matvec, b, x0=None, M=None, tol=1e-10, atol=0.0,
                restart=50, maxiter=20):
    """Restarted GMRES via jax.scipy (left-preconditioned). Returns (x, info);
    info['resnorm'] is the true residual norm computed afterwards."""
    x0 = jnp.zeros_like(b) if x0 is None else x0
    x, _ = jax.scipy.sparse.linalg.gmres(
        matvec,
        b,
        x0=x0,
        M=M or _identity,
        tol=tol,
        atol=atol,
        restart=restart,
        maxiter=maxiter,
        solve_method="batched",
    )
    r = b - matvec(x)
    resnorm = jnp.linalg.norm(r)
    bnorm = jnp.linalg.norm(b)
    info = {
        "iters": jnp.array(-1),
        "resnorm": resnorm,
        "converged": resnorm <= jnp.maximum(tol * bnorm, atol) * 10,
    }
    return x, info
