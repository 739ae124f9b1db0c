"""Differentiable implicit PDE solve via the implicit-function theorem.

This replaces the reference's hand-written adjoint plumbing
(state_operation.py:8-296: solve_residual_equations / compute_jacvec_product /
apply_inverse_jacobian, plus the UFL dR/du, dR/df form zoo of
set_up_fea_derivatives): `jax.custom_vjp` supplies the same mathematics —
  reverse:  solve A^T lam = g_u, then vjp_params = -(dR/dparams)^T lam
  forward:  solve A du = -(dR/dparams) dparams
— but the partials come from `jax.vjp`/`jax.jvp` through the assembled
residual, so no per-input derivative forms are ever written by hand.

BC treatment: the residual is "constrained" (BC rows = u - u_bc). The
linearized solve uses the symmetrically masked operator
B = f·A·f + (1-f)·I; solving B^T lam = f·g yields lam with zero entries at
BC dofs — exactly the reference's post-adjoint zeroing
(state_operation.py:217-218).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..assembly.assemble import (
    FemForm,
    assemble_residual,
    element_matrices,
)
from ..assembly.bc import constrain_residual
from ..solvers.linear import LinearSolver


class ImplicitPDE:
    """Bundles a residual (cell form + optional facet forms + optional extra
    terms) with BC data and a linear solver choice; exposes `solve(params)`
    that is end-to-end differentiable and jit-compatible (fixed Newton
    iteration count, while-loop Krylov inner).

    form: FemForm over the state space. facet_forms: list of FacetForm
    (e.g. penalty BC boundary integrals — their Jacobians enter the operator
    AND the preconditioner). extra_residual(u, params): non-form terms such
    as point loads. newton_iters: static count (1 for linear problems —
    parity with the reference's linear_problem fast path,
    state_operation.py:130; its NewtonSolver uses max_it=3,
    utils_dolfinx.py:449).
    """

    def __init__(
        self,
        form: FemForm,
        free_mask=None,
        bc_vals=None,
        newton_iters=1,
        solver_opts=None,
        extra_residual=None,
        facet_forms=(),
    ):
        self.form = form
        n = form.space.n_dofs
        self.n_dofs = n
        self.free_mask = jnp.ones(n) if free_mask is None else free_mask
        self.bc_vals = jnp.zeros(n) if bc_vals is None else bc_vals
        self.newton_iters = newton_iters
        self.solver_opts = dict(solver_opts or {})
        self.extra_residual = extra_residual
        self.facet_forms = list(facet_forms)
        self._solve = _build_custom_vjp_solve(self)

    # -------------------------------------------------- raw pieces
    def residual(self, u, params):
        """Constrained residual: BC rows replaced by (u - u_bc)."""
        r = assemble_residual(self.form, u, params)
        for ff in self.facet_forms:
            r = r + ff.assemble_residual(u, params)
        if self.extra_residual is not None:
            r = r + self.extra_residual(u, params)
        return constrain_residual(r, u, self.free_mask, self.bc_vals)

    def make_solver(self, u, params) -> LinearSolver:
        ops = [(element_matrices(self.form, u, params), self.form.space)]
        for ff in self.facet_forms:
            ops.extend(ff.element_ops(u, params))
        if self.extra_residual is not None:
            _, extra_lin = jax.linearize(
                lambda v: self.extra_residual(v, params), u
            )
        else:
            extra_lin = None
        opts = dict(self.solver_opts)
        # precond_factory(u, params) -> M (v -> M^{-1} v): lets models inject
        # state-dependent preconditioners (e.g. geometric multigrid rebuilt
        # for the current thickness field) into every fwd/adjoint solve
        pf = opts.pop("precond_factory", None)
        M = pf(u, params) if pf is not None else None
        return LinearSolver(
            ops,
            self.n_dofs,
            free_mask=self.free_mask,
            extra_matvec=extra_lin,
            M=M,
            **opts,
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
