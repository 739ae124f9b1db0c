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


def cg_solve(matvec, b, x0=None, M=None, tol=1e-10, atol=0.0, maxiter=1000,
             restarts=1):
    """Preconditioned conjugate gradient.

    Returns (x, info) with info = dict(iters, resnorm, converged). matvec and
    M are functions v -> Av / M^{-1}v (M is the preconditioner application).

    restarts: after the recurrence-residual stopping test fires, recompute
    the TRUE residual b - A x and re-enter the loop if it still exceeds the
    target (up to `restarts` times). With a near-exact preconditioner (e.g.
    the banded Cholesky factor) the recurrence residual collapses orders of
    magnitude below the true residual within a few iterations and the
    stopping test fires early; one restart recovers the attainable floor
    for one extra matvec+apply. The final reported resnorm is always a true
    residual norm.
    """
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.linalg.norm(b)
    target = jnp.maximum(tol * bnorm, atol)

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

    def one_pass(x, k):
        r = b - matvec(x)
        z = M(r)
        rz = jnp.vdot(r, z)
        return jax.lax.while_loop(cond, body, (x, r, z, p_init(z), rz, k))

    def p_init(z):
        return z

    x, r, z, p, rz, k = one_pass(x0, 0)
    for _ in range(max(0, restarts)):
        x, r, z, p, rz, k = one_pass(x, k)
    resnorm = jnp.linalg.norm(b - matvec(x))
    info = {
        "iters": k,
        "resnorm": resnorm,
        "converged": resnorm <= jnp.maximum(target, 1e-300),
    }
    return x, info


def cg_solve_df(matvec, b, x0=None, M=None, tol=1e-10, atol=0.0,
                maxiter=1000, restarts=1):
    """Fused PCG with float-float (double-single) vector state.

    Same contract as cg_solve. The CG vectors (x, r, z, p) live as DF
    pairs (two f32 words, ~2^-48 — solvers/dfloat.py) and every dot/axpy
    runs in native-f32 float-float arithmetic; the operator and
    preconditioner stay f64 callables, with one exact f64<->DF conversion
    per application. On the TPU backend, XLA-emulated f64 vector ops run
    at ~3.5 GB/s while the handwritten DF ops reach ~58 GB/s (measured
    2026-08-18, fused 100-iteration dot+axpy loop: 2.8x at 63k elements,
    16.4x at 1M — tools/df_microbench.py); since the platform stores f64
    as a float-float pair anyway, DF state gives up no precision there.
    Each restart (and the final residual report) goes through a full-f64
    recomputation b - A x, so the returned solution quality matches
    cg_solve's.
    """
    from .dfloat import DF, df_axpy, df_dot, df_from_f64, df_neg, df_to_f64

    M = M or _identity
    x064 = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.linalg.norm(b)
    target = jnp.maximum(tol * bnorm, atol)
    t2 = target * target

    def cond(state):
        x, r, z, p, rz, rr, k = state
        return jnp.logical_and(rr > t2, k < maxiter)

    def body(state):
        x, r, z, p, rz, rr, k = state
        Ap = df_from_f64(matvec(df_to_f64(p)))
        pAp = df_to_f64(df_dot(p, Ap))
        alpha64 = rz / jnp.where(pAp != 0.0, pAp, 1.0)
        alpha = df_from_f64(alpha64)
        x = df_axpy(alpha, p, x)
        r = df_axpy(df_neg(alpha), Ap, r)
        z = df_from_f64(M(df_to_f64(r)))
        rz_new = df_to_f64(df_dot(r, z))
        beta = df_from_f64(rz_new / jnp.where(rz != 0.0, rz, 1.0))
        p = df_axpy(beta, p, z)
        rr = df_to_f64(df_dot(r, r))
        return (x, r, z, p, rz_new, rr, k + 1)

    def one_pass(x64, k):
        r64 = b - matvec(x64)
        z64 = M(r64)
        x, r, z = df_from_f64(x64), df_from_f64(r64), df_from_f64(z64)
        p = DF(z.hi, z.lo)
        rz = jnp.vdot(r64, z64)
        rr = jnp.vdot(r64, r64)
        st = jax.lax.while_loop(cond, body, (x, r, z, p, rz, rr, k))
        return df_to_f64(st[0]), st[6]

    x64, k = one_pass(x064, 0)
    for _ in range(max(0, restarts)):
        x64, k = one_pass(x64, k)
    resnorm = jnp.linalg.norm(b - matvec(x64))
    info = {
        "iters": k,
        "resnorm": resnorm,
        "converged": resnorm <= jnp.maximum(target, 1e-300),
    }
    return x64, info


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


def cg_chunk_iterations(matvec, M, chunk, x, r, z, p, rz, target,
                        count=False):
    """`chunk` frozen-on-converged PCG iterations (pure function — embed in
    any jit; see make_cg_chunk). With count=True also returns the number
    of ACTIVE (not yet converged) iterations as a final int32 scalar —
    callers use it to right-size subsequent chunks."""
    import jax

    def body(_, st):
        x, r, z, p, rz, n = st
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
        n = n + active.astype(n.dtype)
        return (x, r, z, p, rz, n)

    x, r, z, p, rz, n = jax.lax.fori_loop(
        0, chunk, body, (x, r, z, p, rz, jnp.zeros((), jnp.int32)))
    if count:
        return x, r, z, p, rz, jnp.linalg.norm(r), n
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


def make_cg_chunk_df(matvec, M=None, chunk=40):
    """Float-float twin of make_cg_chunk: the CG vector state (x, r, z, p)
    lives as DF pairs (two f32 words, ~2^-48) and all dots/axpys run in
    native-f32 float-float arithmetic instead of XLA's software f64; the
    operator and preconditioner stay f64 callables (one exact f64<->DF
    conversion per application — two casts + one add per element, cheap
    next to streaming the element matrices).

    Motivation: on TPU every f64 vector op is software-emulated; the
    dot/axpy phase of the outer CG is a measurable slice of each iteration
    (see COVERAGE.md perf notes and tools/df_microbench.py for the
    measured decision)."""
    import jax as _jax

    from .dfloat import df_axpy, df_dot, df_from_f64, df_neg, df_to_f64

    M = M or _identity

    @_jax.jit
    def run_chunk(x, r, z, p, rz64, target):
        def body(_, st):
            x, r, z, p, rz64 = st
            Ap = df_from_f64(matvec(df_to_f64(p)))
            pAp64 = df_to_f64(df_dot(p, Ap))
            rnorm2 = df_to_f64(df_dot(r, r))
            active = rnorm2 > target * target
            alpha64 = jnp.where(
                active, rz64 / jnp.where(pAp64 != 0, pAp64, 1.0), 0.0)
            alpha = df_from_f64(alpha64)
            x = df_axpy(alpha, p, x)
            r = df_axpy(df_neg(alpha), Ap, r)
            z = df_from_f64(M(df_to_f64(r)))
            rz_new64 = df_to_f64(df_dot(r, z))
            beta64 = jnp.where(
                active, rz_new64 / jnp.where(rz64 != 0, rz64, 1.0), 0.0)
            p = df_axpy(df_from_f64(beta64), p, z)
            rz64 = jnp.where(active, rz_new64, rz64)
            return (x, r, z, p, rz64)

        x, r, z, p, rz64 = _jax.lax.fori_loop(
            0, chunk, body, (x, r, z, p, rz64))
        return x, r, z, p, rz64, jnp.sqrt(df_to_f64(df_dot(r, r)))

    return run_chunk


def cg_solve_hostloop_df(matvec, b, x0=None, M=None, tol=1e-10, atol=0.0,
                         maxiter=1000, chunk=40, run_chunk=None):
    """Host-driven PCG with float-float vector state (see make_cg_chunk_df).
    Same contract as cg_solve_hostloop; b/x0 are f64, the returned x is f64
    (accurate to ~2^-48 — below any FEM solve tolerance in use)."""
    from .dfloat import df_from_f64, df_to_f64

    M = M or _identity
    if run_chunk is None:
        run_chunk = make_cg_chunk_df(matvec, M, chunk)
    x64 = jnp.zeros_like(b) if x0 is None else x0
    bnorm = float(jnp.linalg.norm(b))
    target = jnp.asarray(max(tol * bnorm, atol, 1e-300), b.dtype)
    r64 = b - matvec(x64)
    z64 = M(r64)
    x, r, z, p = (df_from_f64(v) for v in (x64, r64, z64, z64))
    rz64 = jnp.vdot(r64, z64)
    it = 0
    resnorm = float(jnp.linalg.norm(r64))
    while resnorm > float(target) and it < maxiter:
        x, r, z, p, rz64, rn = run_chunk(x, r, z, p, rz64, target)
        resnorm = float(rn)
        it += chunk
    info = {
        "iters": jnp.asarray(min(it, maxiter)),
        "resnorm": jnp.asarray(resnorm),
        "converged": resnorm <= float(target),
    }
    return df_to_f64(x), info


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
