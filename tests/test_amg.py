"""Algebraic invariants of the experimental aggregation AMG
(solvers/amg.py): P/R adjointness, exact Galerkin coarse product, SPD
preconditioner, penalty dof detection. See the module docstring for why this
is NOT the default unstructured-shell solver (thin-shell near-kernels need a
spectral coarse space; the production path is solvers/band.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.mesh import createWingShellMesh
from femo_alpha_tpu.models.rm_shell.pde import RMShellPDE
from femo_alpha_tpu.assembly.assemble import element_matrices, make_matvec
from femo_alpha_tpu.solvers.amg import (
    AggregationAMG, build_penalty_split_precond, penalty_split)


@pytest.fixture(scope="module")
def shell_setup():
    m = createWingShellMesh(n_chord=6, n_span=8, rib_stations=(4,))
    pde = RMShellPDE(m, element_wise_material=True)
    W = pde.W
    n = W.n_dofs
    ff = pde.make_penalty_facet_form(lambda x: np.abs(x[:, 1]) < 1e-9)
    nel = m.n_cells
    params = {
        "thickness": jnp.full(nel, 0.01),
        "E": jnp.full(nel, 7e10),
        "nu": jnp.full(nel, 0.33),
        "uhat": jnp.zeros(3 * m.n_nodes),
        "F_solid": jnp.zeros(3 * m.n_nodes),
    }
    u0 = jnp.zeros(n)
    form = pde.make_residual_form()
    Ae = element_matrices(form, u0, params)
    facet_ops = ff.element_ops(u0, params)
    amg = AggregationAMG(W)
    return W, Ae, facet_ops, amg, n


def test_restrict_is_prolong_adjoint(shell_setup):
    W, Ae, facet_ops, amg, n = shell_setup
    rng = np.random.default_rng(1)
    xc = jnp.asarray(rng.standard_normal(amg.nc_dofs))
    y = jnp.asarray(rng.standard_normal(n))
    lhs = jnp.vdot(amg.prolong(xc), y)
    rhs = jnp.vdot(xc, amg.restrict(y))
    assert abs(float(lhs - rhs)) < 1e-10 * abs(float(lhs))


def test_galerkin_coarse_exact(shell_setup):
    """Chunked pair-scatter coarse assembly == dense P^T A P."""
    W, Ae, facet_ops, amg, n = shell_setup
    pen_mask, _ = penalty_split(facet_ops, n)
    fm = 1.0 - pen_mask
    state = amg.setup(Ae, free_mask=fm)
    mv = make_matvec(Ae, W)

    def Af(x):
        return fm * mv(fm * x)

    P = jax.vmap(amg.prolong)(jnp.eye(amg.nc_dofs)).T
    Ac_direct = P.T @ jax.vmap(Af, in_axes=1, out_axes=1)(P)
    s = state["coarse_scale"]
    Ac_amg = jnp.linalg.inv(state["coarse_inv"]) / (s[:, None] * s[None, :])
    rel = float(jnp.linalg.norm(Ac_direct - Ac_amg)
                / jnp.linalg.norm(Ac_direct))
    assert rel < 1e-8, rel


def test_preconditioner_spd(shell_setup):
    W, Ae, facet_ops, amg, n = shell_setup
    M = build_penalty_split_precond(amg, Ae, facet_ops, jnp.ones(n))
    rng = np.random.default_rng(2)
    v1 = jnp.asarray(rng.standard_normal(n))
    v2 = jnp.asarray(rng.standard_normal(n))
    s1 = float(jnp.vdot(v2, M(v1)))
    s2 = float(jnp.vdot(v1, M(v2)))
    assert abs(s1 - s2) < 1e-10 * abs(s1)
    assert float(jnp.vdot(v1, M(v1))) > 0.0


def test_penalty_split_detects_root_dofs(shell_setup):
    """Penalty mask covers exactly the dofs with beta-scale diagonal."""
    W, Ae, facet_ops, amg, n = shell_setup
    pen_mask, pen_diag = penalty_split(facet_ops, n)
    npen = int(jnp.sum(pen_mask))
    assert npen > 0
    # penalized dofs must sit on the root line y=0
    dof_y = np.concatenate([
        np.repeat(np.asarray(s.dof_coords)[:, 1], s.value_size)
        for s in W.subspaces
    ])
    ys = dof_y[np.asarray(pen_mask) > 0]
    assert np.abs(ys).max() < 1e-8


def test_amg_fallback_selected_and_solves_wing(monkeypatch):
    """When the band preconditioner trips the memory guard, RMShellModel
    must select the aggregation-AMG fallback (round-4 verdict: the old
    fallback was plain Jacobi, unusable on shells) and still reproduce the
    band-path solution end-to-end on a small unstructured penalty wing."""
    import jax
    from femo_alpha_tpu.models import RMShellModel

    def build():
        m = createWingShellMesh(n_chord=10, n_span=24, rib_stations=(12,),
                                shuffle_seed=3)
        return m, RMShellModel(m, shell_bc_func=lambda x: x[:, 1] < 1e-9,
                               element_wise_material=True)

    def run(model, mesh):
        nel, nn = mesh.n_cells, mesh.n_nodes
        f = jnp.zeros(3 * nn).at[2::3].set(200.0)
        E = jnp.full(nel, 4.32e8)
        nu = jnp.zeros(nel)
        rho = jnp.full(nel, 100.0)
        th = jnp.full(nel, 0.2)

        def J(t):
            out = model.evaluate(f, t, E, nu, rho, is_pressure=True)
            return out.compliance, out.disp_solid

        (val, u), g = jax.value_and_grad(J, has_aux=True)(th)
        return float(val), np.asarray(u), np.asarray(g)

    mesh_b, model_b = build()
    from femo_alpha_tpu.solvers.band import BandPrecond

    assert isinstance(
        model_b.fea.states["disp_solid"].pde._pc, BandPrecond)
    J_b, u_b, g_b = run(model_b, mesh_b)

    monkeypatch.setenv("FEMO_BAND_MEM_GB", "0.000001")
    mesh_a, model_a = build()
    from femo_alpha_tpu.solvers.amg import AMGPrecondFactory

    assert isinstance(
        model_a.fea.states["disp_solid"].pde._pc, AMGPrecondFactory), (
        "memory guard did not select the AMG fallback")
    J_a, u_a, g_a = run(model_a, mesh_a)

    assert abs(J_a - J_b) < 1e-8 * abs(J_b)
    assert np.linalg.norm(u_a - u_b) < 1e-7 * np.linalg.norm(u_b)
    assert np.linalg.norm(g_a - g_b) < 1e-5 * np.linalg.norm(g_b)
