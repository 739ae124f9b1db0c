"""Poisson + elasticity model classes: MMS/physics sanity + adjoint FD."""

import numpy as np
import jax.numpy as jnp

from femo_alpha_tpu.mesh import createUnitSquareMesh, createRectangleMesh
from femo_alpha_tpu.models import PoissonModel, ElasticityModel
from femo_alpha_tpu.adjoint import check_totals


def test_poisson_model_mms():
    mesh = createUnitSquareMesh(12, 12, "triangle")
    m = PoissonModel(mesh)
    x = m.V.dof_coords
    f = 2 * np.pi**2 * np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    out = m.evaluate(np.ones(m.K.n_dofs), f)
    uex = np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    assert np.abs(np.asarray(out.u) - uex).max() < 2e-2


def test_poisson_model_adjoint():
    mesh = createUnitSquareMesh(6, 6, "triangle")
    m = PoissonModel(mesh)
    x = m.V.dof_coords
    f = jnp.asarray(np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1]))

    def obj(p):
        return jnp.reshape(m.evaluate(p["kappa"], f).compliance, ())

    check_totals(obj, {"kappa": jnp.ones(m.K.n_dofs) * 1.3}, eps=1e-6,
                 directions=2, rtol=1e-5, verbose=False)


def test_elasticity_cantilever_physics_and_adjoint():
    # slender cantilever under uniform transverse load density q (f is a
    # force-per-unit-area field, like the shell's F_solid):
    # w = q*H per length => tip deflection w L^4 / (8 E I)
    L, H, E, q = 10.0, 1.0, 1e6, -1.0
    mesh = createRectangleMesh(40, 4, (0, 0), (L, H), "quad")
    m = ElasticityModel(mesh, E=E, nu=0.0)
    nn = mesh.n_nodes
    f = np.zeros((nn, 2))
    f[:, 1] = q
    t0 = np.ones(mesh.n_cells)
    out = m.evaluate(t0, f.reshape(-1))
    uy = np.asarray(out.u).reshape(-1, 2)[:, 1]
    eb = abs(q) * H * L**4 / (8 * E * (H**3 / 12))
    tip = np.abs(uy).max()
    assert abs(tip - eb) / eb < 0.1, (tip, eb)
    assert abs(float(out.volume) - L * H) < 1e-10

    def obj(p):
        return jnp.reshape(
            m.evaluate(p["thickness"], f.reshape(-1)).compliance, ())

    check_totals(obj, {"thickness": jnp.asarray(t0)}, eps=1e-6, directions=2,
                 rtol=1e-5, verbose=False)


def test_elasticity_uniaxial_stretch():
    # uniform axial load density p: u_x(L) = p L^2 / (2 E)
    L, H, E, p = 10.0, 1.0, 1e6, 1.0
    mesh = createRectangleMesh(20, 2, (0, 0), (L, H), "quad")
    m = ElasticityModel(mesh, E=E, nu=0.0)
    f = np.zeros((mesh.n_nodes, 2))
    f[:, 0] = p
    out = m.evaluate(np.ones(mesh.n_cells), f.reshape(-1))
    ux = np.asarray(out.u).reshape(-1, 2)[:, 0]
    assert abs(ux.max() - p * L**2 / (2 * E)) / (p * L**2 / (2 * E)) < 1e-6
