"""Poisson model with a design-field conductivity.

Covers the reference's first-PDE-capability tier (SURVEY.md §7.2 step 1-2,
BASELINE.json config '2D Poisson on unit-square mesh, P1 Lagrange, CG
solve'): -div(kappa grad u) = f with Dirichlet BCs, compliance-style
outputs, fully differentiable w.r.t. kappa and f.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..assembly.assemble import FemForm
from ..assembly.geometry import map_gradients
from ..fea import FEA, FEAModel
from ..spaces import FunctionSpace, locate_dofs_geometric


class PoissonModel:
    def __init__(self, mesh, degree=1, kappa_space="DG", bc_func=None,
                 solver_opts=None):
        self.mesh = mesh
        self.V = FunctionSpace(mesh, "P", degree)
        self.K = FunctionSpace(mesh, kappa_space, 0 if kappa_space == "DG"
                               else 1)
        tab = self.V.tabulate(quad_degree=2 * degree + 2)
        tab_k = self.K.tabulate(points=tab.points, weights=tab.weights)
        phi = jnp.asarray(tab.phi)
        phi_k = jnp.asarray(tab_k.phi)
        is_dg0 = kappa_space == "DG"

        def energy(u_cell, x_cell, p):
            dphi_x, wdet = map_gradients(x_cell, tab)
            gu = jnp.einsum("qag,a->qg", dphi_x, u_cell)
            kq = p["kappa"][0] if is_dg0 else phi_k @ p["kappa"]
            fq = phi @ p["f"]
            uq = phi @ u_cell
            return jnp.sum(
                wdet * (0.5 * kq * jnp.sum(gu * gu, axis=1) - fq * uq))

        form = FemForm(self.V, energy, kind="energy",
                       param_specs={"kappa": self.K, "f": self.V})
        fea = FEA(mesh)
        fea.add_input("kappa", self.K)
        fea.add_input("f", self.V)
        fea.add_state("u", form, arguments=["kappa", "f"],
                      solver_opts=solver_opts or {"method": "cg",
                                                  "tol": 1e-12})
        bc_func = bc_func or (lambda x: _on_boundary_default(mesh, x))
        bdofs = locate_dofs_geometric(self.V, bc_func)
        fea.add_strong_bc(bdofs, 0.0)
        fea.add_output(
            "compliance", fn=lambda vals: jnp.vdot(vals["f"], vals["u"]))
        fea.add_output(
            "mean_u", fn=lambda vals: jnp.mean(vals["u"]))
        self.fea = fea
        self.model = FEAModel(fea=[fea])

    def evaluate(self, kappa, f):
        return self.model.evaluate({"kappa": jnp.asarray(kappa),
                                    "f": jnp.asarray(f)})


class NonlinearPoissonModel:
    """Genuinely nonlinear PDE family through the Newton path (VERDICT
    round-1 item 9; reference: solveNonlinear/SNES newtonls,
    utils_dolfinx.py:338-468):

        -div(kappa grad u) + kappa u^3 = f     u = 0 on boundary

    from the convex energy E(u) = ∫ kappa (|∇u|²/2 + u⁴/4) − f·u dx, so the
    residual is jax.grad of the cell energy (the `ufl.derivative` analogue)
    and the Newton Jacobian kappa(∇·,∇·) + 3·kappa·u²(·,·) is SPD.

    Two solve surfaces, both tested:
      evaluate()       — FEA/ImplicitPDE with newton_iters>1 (fixed-trip,
                         differentiable end-to-end via the staged IFT vjp);
      solve_checked()  — solvers.newton_solve with real convergence control
                         (atol/rtol/max_it, raises on nonconvergence by
                         default — upgrades the reference's silent
                         error_on_nonconvergence=False, utils_dolfinx.py:443).
    """

    def __init__(self, mesh, degree=1, bc_func=None, newton_iters=8,
                 solver_opts=None):
        self.mesh = mesh
        self.V = FunctionSpace(mesh, "P", degree)
        self.K = FunctionSpace(mesh, "DG", 0)
        tab = self.V.tabulate(quad_degree=2 * degree + 2)
        phi = jnp.asarray(tab.phi)

        def energy(u_cell, x_cell, p):
            dphi_x, wdet = map_gradients(x_cell, tab)
            gu = jnp.einsum("qag,a->qg", dphi_x, u_cell)
            uq = phi @ u_cell
            fq = phi @ p["f"]
            kq = p["kappa"][0]
            return jnp.sum(wdet * (kq * (0.5 * jnp.sum(gu * gu, axis=1)
                                         + 0.25 * uq ** 4) - fq * uq))

        form = FemForm(self.V, energy, kind="energy",
                       param_specs={"kappa": self.K, "f": self.V})
        fea = FEA(mesh)
        fea.linear_problem = False
        fea.add_input("kappa", self.K)
        fea.add_input("f", self.V)
        fea.add_state("u", form, arguments=["kappa", "f"],
                      newton_iters=newton_iters,
                      solver_opts=solver_opts or {"method": "cg",
                                                  "tol": 1e-13})
        bc_func = bc_func or (lambda x: _on_boundary_default(mesh, x))
        bdofs = locate_dofs_geometric(self.V, bc_func)
        fea.add_strong_bc(bdofs, 0.0)
        fea.add_output(
            "compliance", fn=lambda vals: jnp.vdot(vals["f"], vals["u"]))
        self.fea = fea
        self.model = FEAModel(fea=[fea])

    def evaluate(self, kappa, f):
        return self.model.evaluate({"kappa": jnp.asarray(kappa),
                                    "f": jnp.asarray(f)})

    def solve_checked(self, kappa, f, atol=1e-11, rtol=1e-11, max_it=20,
                      **kw):
        """Newton with convergence control; returns (u, info)."""
        from ..solvers import newton_solve

        pde = self.fea.states["u"].pde
        params = {"kappa": jnp.asarray(kappa), "f": jnp.asarray(f)}

        def linear_step(u, r):
            return pde.make_solver(u, params).solve(r)

        u0 = jnp.zeros(pde.n_dofs)
        return newton_solve(lambda u: pde.residual(u, params), linear_step,
                            u0, atol=atol, rtol=rtol, max_it=max_it, **kw)


def _on_boundary_default(mesh, x):
    lo = mesh.coords.min(axis=0)
    hi = mesh.coords.max(axis=0)
    eps = 1e-12
    m = np.zeros(len(x), dtype=bool)
    for d in range(mesh.gdim):
        m |= (np.abs(x[:, d] - lo[d]) < eps) | (np.abs(x[:, d] - hi[d]) < eps)
    return m
