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


def make_cg_chunk(matvec, M=None, chunk=40):
    """Jit-compiled block of `chunk` PCG iterations with frozen-on-converged
    updates (alpha masked to 0 once ||r|| <= target), for host-driven CG.

    The experimental TPU platform plugin faults on fused f64 while_loops at
    larger sizes; a fixed-trip fori_loop block + host convergence check runs
    the same arithmetic without the faulting construct, at ~chunk fewer
    dispatches than a per-iteration host loop."""
    import jax

    import jax as _jax

    M = M or _identity

    @_jax.jit
    def run_chunk(x, r, z, p, rz, target):
        return cg_chunk_iterations(matvec, M, chunk, x, r, z, p, rz, target)

    return run_chunk


def cg_chunk_iterations(matvec, M, chunk, x, r, z, p, rz, target):
    """`chunk` frozen-on-converged PCG iterations (pure function — embed in
    any jit; see make_cg_chunk)."""
    import jax

    def body(_, st):
        x, r, z, p, rz = st
        Ap = matvec(p)
        pAp = jnp.vdot(p, Ap)
        active = jnp.linalg.norm(r) > target
        alpha = jnp.where(
            active, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(active, rz_new / jnp.where(rz != 0, rz, 1.0),
                         0.0)
        p = z + beta * p
        rz = jnp.where(active, rz_new, rz)
        return (x, r, z, p, rz)

    x, r, z, p, rz = jax.lax.fori_loop(0, chunk, body, (x, r, z, p, rz))
    return x, r, z, p, rz, jnp.linalg.norm(r)


def cg_solve_hostloop(matvec, b, x0=None, M=None, tol=1e-10, atol=0.0,
                      maxiter=1000, chunk=40, run_chunk=None):
    """Host-driven PCG: compiled fixed-size chunks + host convergence checks.
    Same contract as cg_solve. Pass a prebuilt `run_chunk` (make_cg_chunk) to
    share the compiled block across solves."""
    M = M or _identity
    if run_chunk is None:
        run_chunk = make_cg_chunk(matvec, M, chunk)
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = float(jnp.linalg.norm(b))
    target = jnp.asarray(max(tol * bnorm, atol, 1e-300), b.dtype)
    r = b - matvec(x)
    z = M(r)
    p = z
    rz = jnp.vdot(r, z)
    it = 0
    resnorm = float(jnp.linalg.norm(r))
    while resnorm > float(target) and it < maxiter:
        x, r, z, p, rz, rn = run_chunk(x, r, z, p, rz, target)
        resnorm = float(rn)
        it += chunk
    info = {
        "iters": jnp.asarray(min(it, maxiter)),
        "resnorm": jnp.asarray(resnorm),
        "converged": resnorm <= float(target),
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
