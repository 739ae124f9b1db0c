"""Reissner-Mindlin shell tests.

Anchors (SURVEY.md §4, §6): cantilever plate tip deflection vs the
Euler-Bernoulli closed form f·w·L^4/(8EI) (ex_simple_shell.py:98-102);
adjoint-vs-FD via the check_totals pattern (ex_simple_shell.py:104-107);
mass/volume exactness; element variants CG2CG1 / CG2CR1 / CG1CG1 and
penalty vs strong BCs (linear_shell_model.py:47-103)."""

import numpy as np
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.mesh import createRectangleMesh
from femo_alpha_tpu.models import RMShellModel
from femo_alpha_tpu.adjoint import check_totals

E_VAL, NU, H, RHO = 4.32e8, 0.0, 0.2, 1.0
W_PLATE, L_PLATE = 2.0, 10.0
F_D = 10.0 * H  # uniform pressure
EB_TIP = F_D * W_PLATE * L_PLATE**4 / (8 * E_VAL * (W_PLATE * H**3 / 12))


def clamped(x):
    return x[:, 0] < 1e-12


def _build(nx=20, ny=4, cell="quad", **kw):
    mesh = createRectangleMesh(nx, ny, (0, 0), (L_PLATE, W_PLATE), cell,
                               gdim=3)
    model = RMShellModel(mesh, shell_bc_func=clamped,
                         element_wise_material=True, record=False, **kw)
    return mesh, model


def _solve(mesh, model, thickness=None):
    nn, nel = mesh.n_nodes, mesh.n_cells
    p = np.zeros((nn, 3))
    p[:, 2] = F_D
    t = H * np.ones(nel) if thickness is None else thickness
    return model.evaluate(
        jnp.asarray(p), thickness=jnp.asarray(t),
        E=jnp.asarray(E_VAL * np.ones(nel)),
        nu=jnp.asarray(NU * np.ones(nel)),
        density=jnp.asarray(RHO * np.ones(nel)), is_pressure=True,
    )


@pytest.mark.parametrize(
    "cell,etype,penalty,rtol",
    [
        ("quad", "CG2CG1", True, 2e-3),
        ("quad", "CG2CG1", False, 2e-3),
        ("triangle", "CG2CG1", True, 2e-3),
        ("triangle", "CG2CR1", True, 2e-3),
    ],
)
def test_cantilever_tip_deflection_vs_euler_bernoulli(cell, etype, penalty,
                                                      rtol):
    mesh, model = _build(cell=cell, element_type=etype, PENALTY_BC=penalty)
    out = _solve(mesh, model)
    tip = float(np.asarray(out.disp_solid).max())
    assert abs(tip - EB_TIP) / EB_TIP < rtol, (tip, EB_TIP)
    # extraction gives the same nodal max
    assert abs(float(np.asarray(out.disp_extracted)[:, 2].max()) - tip) < 1e-14


def test_cg1cg1_reduced_shear_beats_locking():
    # full integration locks (the reference's known behavior); reduced shear
    # (the getQuadratureRule knob, linear_shell_model.py:88-103) fixes it
    mesh, locked = _build(element_type="CG1CG1")
    mesh2, fixed = _build(element_type="CG1CG1", inplane_deg=2, shear_deg=1)
    tip_locked = float(np.asarray(_solve(mesh, locked).disp_solid).max())
    tip_fixed = float(np.asarray(_solve(mesh2, fixed).disp_solid).max())
    assert tip_locked < 0.5 * EB_TIP
    assert abs(tip_fixed - EB_TIP) / EB_TIP < 5e-3


def test_mass_volume_exact():
    mesh, model = _build(nx=8, ny=2)
    out = _solve(mesh, model)
    assert abs(float(out.mass) - RHO * H * W_PLATE * L_PLATE) < 1e-10
    assert abs(float(out.volume) - H * W_PLATE * L_PLATE) < 1e-10


def test_penalty_and_strong_bc_agree():
    mesh1, m1 = _build(nx=10, ny=2, PENALTY_BC=True)
    mesh2, m2 = _build(nx=10, ny=2, PENALTY_BC=False)
    t1 = float(np.asarray(_solve(mesh1, m1).disp_solid).max())
    t2 = float(np.asarray(_solve(mesh2, m2).disp_solid).max())
    assert abs(t1 - t2) / abs(t2) < 1e-3


@pytest.fixture(scope="module")
def small_shell():
    return _build(nx=8, ny=2)


def test_shell_adjoint_totals_vs_fd(small_shell):
    mesh, model = small_shell
    nn, nel = mesh.n_nodes, mesh.n_cells
    p = np.zeros((nn, 3))
    p[:, 2] = F_D
    base = dict(
        E=jnp.asarray(E_VAL * np.ones(nel)),
        nu=jnp.asarray(NU * np.ones(nel)),
        density=jnp.asarray(RHO * np.ones(nel)),
    )

    def agg(pp):
        out = model.evaluate(pp["force"], thickness=pp["thickness"],
                             node_disp=pp["node_disp"], is_pressure=True,
                             **base)
        return jnp.reshape(out.aggregated_stress, ())

    params = {
        "thickness": jnp.asarray(H * np.ones(nel)),
        "force": jnp.asarray(p),
        "node_disp": jnp.zeros((nn, 3)),
    }
    check_totals(agg, params, eps=1e-6, directions=2, rtol=1e-4,
                 verbose=False)


def test_shell_thickness_optimization_smoke(small_shell):
    from femo_alpha_tpu.opt import OptimizationProblem

    mesh, model = small_shell
    nn, nel = mesh.n_nodes, mesh.n_cells
    p = np.zeros((nn, 3))
    p[:, 2] = F_D
    base = dict(
        E=jnp.asarray(E_VAL * np.ones(nel)),
        nu=jnp.asarray(NU * np.ones(nel)),
        density=jnp.asarray(RHO * np.ones(nel)),
        force=jnp.asarray(p),
    )

    def ev(dvs):
        return model.evaluate(base["force"], thickness=dvs["thickness"],
                              E=base["E"], nu=base["nu"],
                              density=base["density"], is_pressure=True)

    prob = OptimizationProblem(ev)
    prob.add_design_variable("thickness", H * np.ones(nel), lower=1e-2,
                             upper=10.0)
    prob.set_objective("compliance")
    prob.add_constraint("mass", equals=RHO * H * W_PLATE * L_PLATE)
    dvs, res = prob.solve(maxiter=30, ftol=1e-8, report=False)
    t = np.asarray(dvs["thickness"]).reshape(8, 2)
    # optimized cantilever must be thick at root, thin at tip
    assert t.mean(axis=1)[0] > t.mean(axis=1)[-1]
    # mass constraint satisfied
    out = ev(dvs)
    assert abs(float(out.mass) - RHO * H * W_PLATE * L_PLATE) < 1e-6


def test_subdomain_pnorm_outputs():
    mesh = createRectangleMesh(8, 2, (0, 0), (L_PLATE, W_PLATE), "quad",
                               gdim=3)
    tags = {"root": list(range(8)), "tip": list(range(8, 16))}
    model = RMShellModel(mesh, shell_bc_func=clamped,
                         element_wise_material=True, record=False,
                         mesh_tags=tags)
    out = _solve(mesh, model)
    assert float(out.pnorm_stress_root) > 0
    assert float(out.pnorm_stress_tip) > 0
    # root stresses dominate for a cantilever
    agg_root = float(out.pnorm_stress_root) ** (1 / 100)
    agg_tip = float(out.pnorm_stress_tip) ** (1 / 100)
    assert agg_root > agg_tip
    # tags partition the mesh, and the subset-cell assembly shares the
    # global form's alpha, so the per-tag pnorms must sum to the global
    # pnorm exactly (validates assemble_scalar_subset == mask semantics)
    total = float(out.pnorm_stress_root) + float(out.pnorm_stress_tip)
    assert abs(total - float(out.pnorm_stress)) < 1e-12 * abs(total)


def test_stress_field_output_shape(small_shell):
    mesh, model = small_shell
    out = _solve(mesh, model)
    # DG1 field: 4 dofs per quad cell
    assert np.asarray(out.stress).shape == (mesh.n_cells * 4,)
    assert np.all(np.asarray(out.stress) >= -1e-8)


def test_force_to_pressure_roundtrip(small_shell):
    # F = M q (consistent nodal forces of pressure q); is_pressure=False path
    # must recover q = M^{-1} F (rm_shell_pde.py:194-209 + csdl.solve_linear)
    mesh, model = small_shell
    nn = mesh.n_nodes
    pde = model.shell_pde
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal(3 * nn))
    solve_p = pde.make_force_to_pressure_solver()
    # M q = residual of the mass system at u=q with F=0 (r(u) = M u - F)
    Mq = solve_p.pde.residual(q, {"F_vec": jnp.zeros(3 * nn)})
    q_rec = solve_p(Mq)
    assert np.allclose(np.asarray(q_rec), np.asarray(q), atol=1e-8)


def test_composite_clt_single_layer_matches_isotropic():
    """A one-ply isotropic laminate (MID plane) must reproduce the isotropic
    single-layer model exactly (MaterialModelComposite parity,
    linear_shell_model.py:159-190)."""
    from femo_alpha_tpu.models.rm_shell.material import CompositeCLT

    mesh, model = _build()
    clt = CompositeCLT.from_layup(
        mesh.n_cells, E_layers=[E_VAL], nu_layers=[NU],
        z_interfaces=[-H / 2, H / 2])
    mesh2 = createRectangleMesh(20, 4, (0, 0), (L_PLATE, W_PLATE), "quad",
                                gdim=3)
    model_c = RMShellModel(mesh2, shell_bc_func=clamped,
                           element_wise_material=True, record=False,
                           composite_clt=clt)
    out = _solve(mesh, model)
    out_c = _solve(mesh2, model_c)
    u = np.asarray(out.disp_solid)
    uc = np.asarray(out_c.disp_solid)
    # atol floors the near-zero entries (clamped-edge dofs land at the CG
    # roundoff level ~1e-14, which wobbles run to run); 1e-12 is still 1e-9
    # of the ~1e-3 displacement scale
    assert np.allclose(u, uc, rtol=1e-9, atol=1e-12)
    assert np.isclose(float(out.compliance), float(out_c.compliance),
                      rtol=1e-9)


def test_composite_clt_stiffer_laminate_deflects_less():
    """Sandwich laminate with stiff faces must be stiffer than its core-only
    counterpart — sanity that B/D integration orders plies correctly."""
    from femo_alpha_tpu.models.rm_shell.material import CompositeCLT

    mesh2 = createRectangleMesh(20, 4, (0, 0), (L_PLATE, W_PLATE), "quad",
                                gdim=3)
    z = [-H / 2, -H / 4, H / 4, H / 2]
    soft = CompositeCLT.from_layup(
        mesh2.n_cells, [E_VAL / 10, E_VAL / 10, E_VAL / 10],
        [NU, NU, NU], z)
    sandwich = CompositeCLT.from_layup(
        mesh2.n_cells, [E_VAL, E_VAL / 10, E_VAL], [NU, NU, NU], z)
    tips = {}
    for name, clt in [("soft", soft), ("sandwich", sandwich)]:
        m = createRectangleMesh(20, 4, (0, 0), (L_PLATE, W_PLATE), "quad",
                                gdim=3)
        model = RMShellModel(m, shell_bc_func=clamped,
                             element_wise_material=True, record=False,
                             composite_clt=clt)
        out = _solve(m, model)
        tips[name] = float(jnp.max(jnp.abs(out.disp_solid)))
    assert tips["sandwich"] < 0.25 * tips["soft"]
