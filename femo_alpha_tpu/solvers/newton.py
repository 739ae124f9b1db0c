"""Newton driver (replaces dolfinx NewtonSolver / SNES newtonls,
utils_dolfinx.py:338-468).

Convergence status is returned as first-class data and, by default, failure
raises — the reference's silent default (`error_on_nonconvergence=False`,
utils_dolfinx.py:443) is deliberately NOT replicated (SURVEY.md §5)."""

from __future__ import annotations

import jax.numpy as jnp

from ..config import config
from ..utils.logging import log


def newton_solve(
    residual_fn,
    linear_solve_fn,
    u0,
    atol=1e-10,
    rtol=1e-10,
    max_it=20,
    report=None,
    error_on_nonconvergence=None,
):
    """Solve R(u) = 0.

    residual_fn(u) -> r; linear_solve_fn(u, r) -> du solving J(u) du = -r
    (sign handled here: we pass r and subtract the returned correction).

    Host-side loop (few iterations; each iteration is one fused XLA program).
    Returns (u, info)."""
    report = config.report if report is None else report
    err = (
        config.error_on_nonconvergence
        if error_on_nonconvergence is None
        else error_on_nonconvergence
    )
    u = u0
    r = residual_fn(u)
    r0 = float(jnp.linalg.norm(r))
    rn = r0
    it = 0
    converged = rn <= atol
    while not converged and it < max_it:
        du = linear_solve_fn(u, r)
        u = u - du
        r = residual_fn(u)
        rn = float(jnp.linalg.norm(r))
        it += 1
        if report:
            log(f"Newton it {it}: |r| = {rn:.3e}")
        converged = rn <= atol or rn <= rtol * max(r0, 1e-300)
    info = {"iters": it, "resnorm": rn, "converged": converged}
    if not converged and err:
        raise RuntimeError(
            f"Newton failed to converge: it={it} |r|={rn:.3e} (|r0|={r0:.3e})"
        )
    return u, info
