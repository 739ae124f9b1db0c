"""Nodal-field cross-validation against a fully independent implementation
(tests/independent_shell.py: plain numpy/scipy, no shared code) — the
substitute for the round-1 VERDICT's "dolfinx golden fields" item (dolfinx
is not installed here). On affine rectangular cells both quadratures are
exact, so the two Galerkin solutions agree at every node to solver
tolerance; the tests assert <= 1e-8 relative, the BASELINE.md bar."""

import numpy as np
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.mesh import createRectangleMesh
from femo_alpha_tpu.models import EulerBernoulliBeamModel, RMShellModel

from independent_shell import (
    beam_hermite_solution,
    implicit_midpoint_history,
    solve_rm_plate,
)


@pytest.mark.parametrize("nx,ny", [(10, 4), (50, 10)])
def test_shell_nodal_fields_match_independent(nx, ny):
    """Static clamped plate (the reference's plate_2_10_quad_10_50 fixture
    shape at nx=50, ny=10): library nodal displacement AND rotation fields
    must match the independent assembly+spsolve to <= 1e-8."""
    L, W = 10.0, 2.0
    mesh = createRectangleMesh(nx, ny, (0, 0), (L, W), "quad", gdim=3)
    rng = np.random.default_rng(7)
    nel, nn = mesh.n_cells, mesh.n_nodes
    thickness = 0.08 + 0.04 * rng.random(nel)
    E = 7.0e10 * (1.0 + 0.1 * rng.random(nel))
    nu = np.full(nel, 0.3)
    density = np.full(nel, 2700.0)
    f_nodal = np.zeros((nn, 3))
    f_nodal[:, 2] = 1.0e4 * (1.0 + np.asarray(mesh.coords[:, 0]) / L)
    f_nodal[:, 0] = 2.0e3 * rng.random(nn)

    def bc(x):
        return x[:, 0] < 1e-12

    model = RMShellModel(
        mesh, shell_bc_func=bc, element_wise_material=True,
        PENALTY_BC=False,
        solver_opts={"method": "cg", "tol": 1e-13, "maxiter": 20000}
        if nn * 9 > 6000 else {"method": "dense"},
    )
    out = model.evaluate(f_nodal, thickness, E, nu, density,
                         is_pressure=True)
    u_lib = np.asarray(out.disp_extracted)
    pde = model.shell_pde
    th_lib = np.asarray(out.disp_solid)[pde.V_disp.n_dofs:].reshape(-1, 3)
    # P1 rotation scalar dofs are mesh vertices (assert, don't assume)
    assert np.allclose(pde.V_rot.dof_coords, np.asarray(mesh.coords))

    u_ind, th_ind = solve_rm_plate(
        np.asarray(mesh.coords), np.asarray(mesh.conn),
        thickness, E, nu, f_nodal, bc_func=lambda xy: xy[:, 0] < 1e-12)

    rel_u = (np.linalg.norm(u_lib - u_ind)
             / np.linalg.norm(u_ind))
    rel_th = (np.linalg.norm(th_lib - th_ind)
              / np.linalg.norm(th_ind))
    assert rel_u <= 1e-8, rel_u
    assert rel_th <= 1e-8, rel_th
    # amplitude sanity: the plate actually bends
    assert np.max(np.abs(u_ind[:, 2])) > 1e-4


def test_beam_nodal_fields_match_independent():
    """Hermite Euler-Bernoulli beam vs the closed-form element stiffness."""
    nel = 50
    thickness = 0.05 + 0.1 * np.linspace(0, 1, nel)
    beam = EulerBernoulliBeamModel(nel=nel, L=1.0, E=1.0, width=0.1,
                                   tip_load=-1.0)
    out = beam.evaluate(jnp.asarray(thickness))
    u = np.asarray(out.displacements)
    defl_lib = u[0::2]
    rot_lib = u[1::2]
    defl_ind, rot_ind = beam_hermite_solution(
        nel, 1.0, 1.0, 0.1, thickness, -1.0)
    # 1e-8 is the BASELINE.md bar; the actual floor (~5e-9) is the f64
    # roundoff of the ill-conditioned Hermite stiffness, not discretization
    assert np.linalg.norm(defl_lib - defl_ind) <= (
        1e-8 * np.linalg.norm(defl_ind))
    assert np.linalg.norm(rot_lib - rot_ind) <= (
        1e-8 * np.linalg.norm(rot_ind))


def test_transient_step_history_matches_independent():
    """One transient history (implicit midpoint, 4 steps) cross-validated:
    the library's lax.scan stepper vs the independent scipy splu stepping of
    the same recurrence (stiffness + shell inertia with h_cell^2-scaled
    rotational term)."""
    from femo_alpha_tpu.models.dynamic_rm_shell import PlateSim

    nx, ny = 8, 4
    L, W = 2.0, 1.0
    mesh = createRectangleMesh(nx, ny, (0, 0), (L, W), "quad", gdim=3)
    nn, nel = mesh.n_nodes, mesh.n_cells
    rng = np.random.default_rng(11)
    thickness = 0.02 + 0.01 * rng.random(nel)
    E, nu, rho = 7.0e10, 0.3, 2700.0
    dt, nsteps = 0.002, 4

    f_hist = np.zeros((nsteps + 1, nn, 3))
    for i in range(nsteps + 1):
        f_hist[i, :, 2] = 500.0 * i / nsteps * (
            1.0 + np.asarray(mesh.coords[:, 0]) / L)

    sim = PlateSim(mesh, E, nu, rho, dt, nsteps,
                   element_wise_thickness=True,
                   custom_bc_func=lambda x: x[:, 0] < 1e-12, quad_deg=4)
    sim.update_f_history(f_hist.reshape(nsteps + 1, -1))
    wh = np.asarray(sim.simulate(jnp.asarray(thickness),
                                 jnp.asarray(f_hist.reshape(nsteps + 1, -1))))
    u_lib = wh[:, : 3 * nn].reshape(nsteps + 1, nn, 3)

    u_ind = implicit_midpoint_history(
        np.asarray(mesh.coords), np.asarray(mesh.conn), thickness,
        np.full(nel, E), np.full(nel, nu), rho, dt, f_hist,
        bc_func=lambda xy: xy[:, 0] < 1e-12)

    rel = (np.linalg.norm(u_lib - u_ind)
           / np.linalg.norm(u_ind))
    assert rel <= 1e-8, rel
    assert np.max(np.abs(u_ind[-1])) > 1e-7  # the plate actually moves
