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


def test_point_and_vertex_utils():
    """getCellID / getVertexToDofMap / applyNodalForces / projectPointForce
    parity helpers (linear_shell_fenicsx/utils.py:21-288)."""
    from femo_alpha_tpu.fea.utils import (
        applyNodalForces, getCellID, getVertexToDofMap, projectPointForce)
    from femo_alpha_tpu.mesh import createRectangleMesh
    from femo_alpha_tpu.spaces import FunctionSpace, MixedSpace

    mesh = createRectangleMesh(8, 4, p0=(0.0, 0.0), p1=(2.0, 1.0),
                               cell_type="quad", structured=False)
    # getCellID: cell midpoints must locate to their own cell
    mids = mesh.cell_midpoints()
    cells = getCellID(mids[[0, 5, 17]], mesh)
    assert list(cells) == [0, 5, 17]

    disp = FunctionSpace(mesh, "P", 2, value_size=3)
    rot = FunctionSpace(mesh, "P", 1, value_size=3)
    W = MixedSpace(disp, rot)
    v2d = getVertexToDofMap(W)
    assert v2d.shape == (mesh.n_nodes, 3)

    f = np.random.default_rng(0).normal(size=(mesh.n_nodes, 3))
    F = np.asarray(applyNodalForces(f, W))
    assert F.shape == (W.n_dofs,)
    np.testing.assert_allclose(F[v2d.reshape(-1)], f.reshape(-1))
    # nothing outside the vertex displacement dofs
    mask = np.ones(W.n_dofs, bool)
    mask[v2d.reshape(-1)] = False
    assert np.all(F[mask] == 0.0)

    # projectPointForce: Riesz map of M@u must recover u (scalar + vector)
    V1 = FunctionSpace(mesh, "P", 1)
    u = np.random.default_rng(1).normal(size=V1.n_dofs)
    from femo_alpha_tpu.assembly.assemble import make_matvec
    import jax as _jax
    from femo_alpha_tpu.assembly.geometry import map_gradients
    tab = V1.tabulate(quad_degree=4)
    phi = jnp.asarray(tab.phi)

    def cell_mass(xc):
        _, wdet = map_gradients(xc, tab)
        return jnp.einsum("qa,qb,q->ab", phi, phi, wdet)

    mv = make_matvec(_jax.vmap(cell_mass)(V1.cell_coords_d), V1)
    got = projectPointForce(V1, mv(jnp.asarray(u)))
    np.testing.assert_allclose(np.asarray(got), u, atol=1e-9)

    V3 = FunctionSpace(mesh, "P", 1, value_size=3)
    u3 = np.random.default_rng(2).normal(size=(V1.n_dofs, 3))
    f3 = np.stack([np.asarray(mv(jnp.asarray(u3[:, c])))
                   for c in range(3)], axis=1).reshape(-1)
    got3 = projectPointForce(V3, f3)
    np.testing.assert_allclose(np.asarray(got3), u3.reshape(-1), atol=1e-9)
