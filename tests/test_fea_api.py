"""Named API parity odds and ends (VERDICT round-1 item 'missing 7'):
FEA.solveLinearFwd / solveLinearBwd (fea_dolfinx.py:173-203) and
add_exact_solution / compute_error (fea_dolfinx.py:138-145,
utils_dolfinx.py:244-256)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.mesh import createUnitSquareMesh
from femo_alpha_tpu.models import PoissonModel


@pytest.fixture(scope="module")
def pm():
    mesh = createUnitSquareMesh(16, 16, cell_type="triangle")
    return PoissonModel(mesh)


def _params(pm):
    rng = np.random.default_rng(1)
    kappa = jnp.asarray(1.0 + rng.random(pm.K.n_dofs))
    x = np.asarray(pm.V.dof_coords)
    f = jnp.asarray(np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1]))
    return {"kappa": kappa, "f": f}


def test_solve_linear_fwd_bwd(pm):
    fea = pm.fea
    params = _params(pm)
    u = fea.solve("u", params)
    pde = fea.states["u"].pde
    rng = np.random.default_rng(2)
    dR = jnp.asarray(rng.standard_normal(pde.n_dofs))
    du = fea.solveLinearFwd("u", u, params, dR)
    # residual of the tangent system on free dofs
    r = pde.make_solver(u, params).matvec(du) - pde.free_mask * dR
    assert float(jnp.linalg.norm(pde.free_mask * r)) < 1e-9 * float(
        jnp.linalg.norm(dR))
    g = jnp.asarray(rng.standard_normal(pde.n_dofs))
    lam = fea.solveLinearBwd("u", u, params, g)
    # symmetric operator: lam solves the same masked system; BC rows zeroed
    assert float(jnp.linalg.norm((1.0 - pde.free_mask) * lam)) == 0.0
    r2 = pde.make_solver(u, params).matvec(lam) - pde.free_mask * g
    assert float(jnp.linalg.norm(pde.free_mask * r2)) < 1e-9 * float(
        jnp.linalg.norm(g))


def test_exact_solution_error_norm(pm):
    # MMS: u = sin(pi x) sin(pi y), kappa = 1
    #   -div(grad u) = 2 pi^2 sin(pi x) sin(pi y)
    fea = pm.fea
    x = np.asarray(pm.V.dof_coords)
    f = jnp.asarray(
        2 * np.pi ** 2 * np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1]))
    params = {"kappa": jnp.ones(pm.K.n_dofs), "f": f}
    u = fea.solve("u", params)

    def exact(pts):
        return np.sin(np.pi * pts[:, 0]) * np.sin(np.pi * pts[:, 1])

    fea.add_exact_solution("u", exact)
    err = float(fea.compute_error("u", u))
    assert err < 2e-2  # P1 on 16x16: O(h^2), measured ~8.4e-3
    # converges at second order
    from femo_alpha_tpu.mesh import createUnitSquareMesh
    from femo_alpha_tpu.models import PoissonModel as PM

    pm2 = PM(createUnitSquareMesh(32, 32, cell_type="triangle"))
    x2 = np.asarray(pm2.V.dof_coords)
    f2 = jnp.asarray(
        2 * np.pi ** 2 * np.sin(np.pi * x2[:, 0]) * np.sin(np.pi * x2[:, 1]))
    u2 = pm2.fea.solve("u", {"kappa": jnp.ones(pm2.K.n_dofs), "f": f2})
    pm2.fea.add_exact_solution("u", exact)
    err2 = float(pm2.fea.compute_error("u", u2))
    assert err2 < 0.3 * err
