"""Poisson manufactured-solution tests (errorNorm-style MMS checks,
SURVEY.md §4; parity anchor: utils_dolfinx.py:244-256 errorNorm)."""

import numpy as np
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.mesh import createUnitSquareMesh
from femo_alpha_tpu.spaces import FunctionSpace, locate_dofs_geometric
from femo_alpha_tpu.assembly import (
    FemForm,
    assemble_residual,
    element_matrices,
    DirichletBC,
    combine_bcs,
)
from femo_alpha_tpu.assembly.geometry import map_gradients
from femo_alpha_tpu.solvers.linear import LinearSolver


def _solve_poisson(n, cell_type, family="P", degree=1, method="cg"):
    mesh = createUnitSquareMesh(n, n, cell_type)
    V = FunctionSpace(mesh, family, degree)
    tab = V.tabulate(quad_degree=2 * degree + 2)
    phi = jnp.asarray(tab.phi)

    def energy(u_cell, x_cell, p):
        dphi_x, wdet = map_gradients(x_cell, tab)
        gu = jnp.einsum("qag,a->qg", dphi_x, u_cell)
        fq = phi @ p["f"]
        uq = phi @ u_cell
        return jnp.sum(wdet * (0.5 * jnp.sum(gu * gu, axis=1) - fq * uq))

    form = FemForm(V, energy, kind="energy", param_specs={"f": V})
    x = V.dof_coords
    f = jnp.asarray(2 * np.pi**2 * np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1]))

    def on_boundary(xx):
        return (
            (np.abs(xx[:, 0]) < 1e-12)
            | (np.abs(xx[:, 0] - 1) < 1e-12)
            | (np.abs(xx[:, 1]) < 1e-12)
            | (np.abs(xx[:, 1] - 1) < 1e-12)
        )

    bdofs = locate_dofs_geometric(V, on_boundary)
    free, bcv = combine_bcs(V.n_dofs, [DirichletBC(bdofs, 0.0)])
    u0 = jnp.zeros(V.n_dofs)
    r = assemble_residual(form, u0, {"f": f})
    Ae = element_matrices(form, u0, {"f": f})
    solver = LinearSolver(
        [(Ae, V.dofmap_d)], V.n_dofs, free_mask=free, method=method, tol=1e-12
    )
    b = solver.lift(-r, bcv)
    u = solver.solve(b)
    # the solve must actually satisfy the constrained system
    res = np.asarray(solver.matvec(u) - b)
    assert np.linalg.norm(res) < 1e-9 * max(1.0, np.linalg.norm(np.asarray(b)))
    uex = np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    return np.abs(np.asarray(u) - uex).max()


@pytest.mark.parametrize("cell_type", ["triangle", "quad"])
def test_p1_converges_second_order(cell_type):
    e1 = _solve_poisson(8, cell_type)
    e2 = _solve_poisson(16, cell_type)
    rate = np.log2(e1 / e2)
    assert rate > 1.7, (e1, e2, rate)


def test_q2_high_accuracy():
    err = _solve_poisson(12, "quad", degree=2)
    assert err < 2e-5


def test_p2_triangle_high_accuracy():
    err = _solve_poisson(12, "triangle", degree=2)
    assert err < 1e-4


def test_dense_direct_matches_cg():
    e_cg = _solve_poisson(6, "triangle", method="cg")
    e_dense = _solve_poisson(6, "triangle", method="dense")
    assert abs(e_cg - e_dense) < 1e-9
