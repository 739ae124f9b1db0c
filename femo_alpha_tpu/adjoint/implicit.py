"""Differentiable implicit PDE solve via the implicit-function theorem.

This replaces the reference's hand-written adjoint plumbing
(state_operation.py:8-296: solve_residual_equations / compute_jacvec_product /
apply_inverse_jacobian, plus the UFL dR/du, dR/df form zoo of
set_up_fea_derivatives): `jax.custom_vjp` supplies the same mathematics —
  reverse:  solve A^T lam = g_u, then vjp_params = -(dR/dparams)^T lam
  forward:  solve A du = -(dR/dparams) dparams
— but the partials come from `jax.vjp`/`jax.jvp` through the assembled
residual, so no per-input derivative forms are ever written by hand.

BC treatment: the residual must be "constrained" (BC rows = u - u_bc). The
linearized solve uses the symmetrically masked operator
B = f·A·f + (1-f)·I, which is self-adjoint-compatible: solving B^T lam = f·g
yields lam with zero entries at BC dofs — exactly the reference's
post-adjoint zeroing (state_operation.py:217-218).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..assembly.assemble import assemble_residual, element_matrices
from ..assembly.bc import constrain_residual
from ..solvers.linear import LinearSolver


class ImplicitPDE:
    """Bundles a FemForm-based residual with BC data and a linear solver
    choice; exposes `solve(params)` that is end-to-end differentiable and
    jit-compatible (fixed Newton iteration count, while-loop Krylov inner).

    form: FemForm over the state space (kernel = raw residual or energy).
    free_mask/bc_vals: from combine_bcs. solver_opts: passed to LinearSolver.
    newton_iters: static iteration count (1 for linear problems — parity with
    the reference's linear_problem fast path, state_operation.py:130; the
    reference's own NewtonSolver uses max_it=3, utils_dolfinx.py:449).
    """

    def __init__(
        self,
        form,
        free_mask=None,
        bc_vals=None,
        newton_iters=1,
        solver_opts=None,
        extra_residual=None,
    ):
        self.form = form
        n = form.space.n_dofs
        self.n_dofs = n
        self.free_mask = (
            jnp.ones(n) if free_mask is None else free_mask
        )
        self.bc_vals = jnp.zeros(n) if bc_vals is None else bc_vals
        self.newton_iters = newton_iters
        self.solver_opts = dict(solver_opts or {})
        # extra_residual(u, params) -> (n_dofs,): non-cell terms — point
        # loads, facet/boundary integrals (the reference's ds/dS measures,
        # e.g. the beam tip load ex_thickness_opt_cantilever_beam.py:61-63)
        self.extra_residual = extra_residual
        self._solve = _build_custom_vjp_solve(self)

    # -------------------------------------------------- raw pieces
    def residual(self, u, params):
        """Constrained residual: BC rows replaced by (u - u_bc)."""
        r = assemble_residual(self.form, u, params)
        if self.extra_residual is not None:
            r = r + self.extra_residual(u, params)
        return constrain_residual(r, u, self.free_mask, self.bc_vals)

    def make_solver(self, u, params) -> LinearSolver:
        Ae = element_matrices(self.form, u, params)
        if self.extra_residual is not None:
            # linearize the extra term; for load vectors (u-independent) this
            # contributes nothing, for penalty-BC terms it adds their Jacobian
            _, lin = jax.linearize(lambda v: self.extra_residual(v, params), u)
            extra_lin = lin
        else:
            extra_lin = None
        return LinearSolver(
            Ae,
            self.form.space.dofmap_d,
            self.n_dofs,
            free_mask=self.free_mask,
            extra_matvec=extra_lin,
            **self.solver_opts,
        )

    def _newton(self, params, u0):
        """Fixed-iteration Newton (traceable)."""
        f = self.free_mask
        u = f * u0 + (1.0 - f) * self.bc_vals
        for _ in range(self.newton_iters):
            r = self.residual(u, params)
            solver = self.make_solver(u, params)
            du = solver.solve(r)
            u = u - du
        return u

    # -------------------------------------------------- public API
    def solve(self, params, u0=None):
        """Differentiable solve. params: pytree of arrays the residual
        closes over via form.param_specs."""
        if u0 is None:
            u0 = jnp.zeros(self.n_dofs)
        return self._solve(params, u0)


def _build_custom_vjp_solve(pde: ImplicitPDE):
    @jax.custom_vjp
    def solve(params, u0):
        return pde._newton(params, u0)

    def fwd(params, u0):
        u = pde._newton(params, u0)
        return u, (params, u)

    def bwd(res, g):
        params, u = res
        solver = pde.make_solver(u, params)
        lam = solver.solve_transpose(pde.free_mask * g)
        lam = pde.free_mask * lam
        _, vjp_fn = jax.vjp(lambda p: pde.residual(u, p), params)
        (gp,) = vjp_fn(lam)
        gp = jax.tree.map(lambda a: -a, gp)
        return gp, jnp.zeros_like(u)

    solve.defvjp(fwd, bwd)
    return solve
