"""Transient RM shell tests (dynamic_rm_shell parity, SURVEY.md §3.3):
implicit-midpoint stepping, dynamic overshoot physics, transient adjoint vs
FD (the reference's check_totals on the dynamic StateOperation,
state_operation_dynamic.py:708-817), operation-layer API."""

import numpy as np
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.mesh import createRectangleMesh
from femo_alpha_tpu.models.dynamic_rm_shell import (
    PlateSim,
    StateOperation,
    TotalStrainEnergyOperation,
    VolumeOperation,
)
from femo_alpha_tpu.adjoint import check_totals

E_VAL, NU, RHO, H = 4.32e8, 0.0, 10.0, 0.2
EB_TIP = 2.0 * 2.0 * 10**4 / (8 * E_VAL * (2 * H**3 / 12))


@pytest.fixture(scope="module")
def sim():
    mesh = createRectangleMesh(10, 2, (0, 0), (10, 2), "quad", gdim=3)
    s = PlateSim(mesh, E_VAL, NU, RHO, dt=0.01, Nsteps=20,
                 element_wise_thickness=True, quad_deg=4)
    nn = mesh.n_nodes
    f = np.zeros((nn, 3))
    f[:, 2] = 2.0
    s.update_f_history(np.tile(f.reshape(1, -1), (21, 1)))
    s.update_t(np.full(mesh.n_cells, H))
    return s


def test_step_load_dynamic_overshoot(sim):
    w_out = sim.solve_dynamic_problem()
    assert w_out.shape == (sim.fe_dofs, sim.time_levels)
    tip = sim.tip_disp_history
    # starts at rest, ramps smoothly, overshoots the static solution by
    # roughly 2x (undamped step response)
    assert tip[0] == 0.0
    assert np.all(np.isfinite(w_out))
    assert 1.4 * EB_TIP < tip.max() < 2.3 * EB_TIP


def test_bc_rows_stay_zero(sim):
    wh = sim.simulate(sim.t_array, jnp.asarray(sim.f_history))
    free = np.asarray(sim.free_mask)
    bc_vals = np.asarray(wh)[:, free == 0.0]
    assert np.abs(bc_vals).max() < 1e-12


def test_energy_history_and_volume(sim):
    wh = sim.simulate(sim.t_array, jnp.asarray(sim.f_history))
    se = np.asarray(sim.strain_energy_history(wh, sim.t_array))
    assert se[0] == 0.0
    assert np.all(se >= -1e-12)
    vol = VolumeOperation(sim).evaluate(sim.t_array)
    assert abs(float(vol) - H * 2 * 10) < 1e-10


def test_transient_adjoint_vs_fd(sim):
    op = StateOperation(sim)
    tse = TotalStrainEnergyOperation(sim)

    def obj(p):
        wh = op.evaluate(p["thickness"])
        return jnp.reshape(tse.evaluate(wh, p["thickness"]), ())

    check_totals(obj, {"thickness": sim.t_array}, eps=1e-5, directions=2,
                 rtol=1e-4, verbose=False)


def test_transient_adjoint_wrt_force_history(sim):
    op = StateOperation(sim)
    tse = TotalStrainEnergyOperation(sim)
    fh = jnp.asarray(sim.f_history)

    def obj(p):
        wh = op.evaluate(sim.t_array, f_history=p["fh"])
        return jnp.reshape(tse.evaluate(wh, sim.t_array), ())

    check_totals(obj, {"fh": fh}, eps=1e-5, directions=1, rtol=1e-4,
                 verbose=False)


def test_timestep_refinement_converges(sim):
    # halving dt with the same end time changes the response smoothly
    mesh = sim.mesh
    nn = mesh.n_nodes
    f = np.zeros((nn, 3))
    f[:, 2] = 2.0
    tips = []
    for dt, N in [(0.02, 10), (0.01, 20)]:
        s = PlateSim(mesh, E_VAL, NU, RHO, dt=dt, Nsteps=N,
                     element_wise_thickness=True, quad_deg=4)
        s.update_f_history(np.tile(f.reshape(1, -1), (N + 1, 1)))
        s.update_t(np.full(mesh.n_cells, H))
        wh = s.simulate(s.t_array, jnp.asarray(s.f_history))
        tips.append(float(s.tip_disp(wh[-1])))
    # both reach the same order of tip displacement at t=0.2
    assert abs(tips[0] - tips[1]) < 0.5 * abs(tips[1]) + 1e-6


def test_svk_residual_zero_at_solution(sim):
    wh = sim.simulate(sim.t_array, jnp.asarray(sim.f_history))
    res_fn = sim.SVK_residual()
    # residual at step 1 (w0 = wdot0 = 0) must vanish on free dofs
    f1 = jnp.asarray(sim.f_history[1])
    r = res_fn(wh[1], wh[0], jnp.zeros(sim.fe_dofs), sim.t_array, f1)
    free = np.asarray(sim.free_mask)
    assert np.abs(np.asarray(r)[free == 1.0]).max() < 1e-7


def test_mg_and_fixed_trip_solvers_match_dense():
    """The TPU per-step solver (geometric MG + fixed-trip chunked CG — no
    while_loop, no f64 factorization) must reproduce the dense-Cholesky
    trajectory, including through the adjoint."""
    import jax
    from femo_alpha_tpu.mesh import StructuredQuadMesh

    mesh = StructuredQuadMesh(16, 8, (0, 0), (10.0, 2.0), gdim=3)
    kw = dict(E=E_VAL, nu=NU, rho=RHO, dt=0.005, Nsteps=6,
              element_wise_thickness=True)
    sim_d = PlateSim(mesh, solver_method="dense", **kw)
    sim_f = PlateSim(mesh, solver_method="mg", mg_coarsest_cells=32,
                     inner_iters=128, **kw)
    assert sim_f.mg is not None and len(sim_f.mg.levels) == 2
    th = jnp.full(sim_d.num_var, H)
    nf = sim_d.W_f.n_dofs
    fh = jnp.zeros((7, nf)).at[:, 2::3].set(1000.0)
    wd = sim_d.simulate(th, fh)
    wf = sim_f.simulate(th, fh)
    scale = float(jnp.max(jnp.abs(wd)))
    assert float(jnp.max(jnp.abs(wf - wd))) < 1e-8 * scale
    gd = jax.grad(lambda t: jnp.sum(sim_d.simulate(t, fh) ** 2))(th)
    gf = jax.grad(lambda t: jnp.sum(sim_f.simulate(t, fh) ** 2))(th)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gd), rtol=1e-6)


def test_unstructured_mesh_falls_back_cleanly():
    """generic Mesh (createRectangleMesh) has no structured hierarchy: the
    'mg' request must fall back to a working solver, not crash."""
    mesh = createRectangleMesh(6, 3, (0, 0), (10, 2), "quad", gdim=3)
    s = PlateSim(mesh, E_VAL, NU, RHO, dt=0.01, Nsteps=3,
                 element_wise_thickness=True, solver_method="mg")
    assert s.mg is None
    th = jnp.full(s.num_var, H)
    fh = jnp.zeros((4, s.W_f.n_dofs)).at[:, 2::3].set(10.0)
    wh = s.simulate(th, fh)
    assert np.isfinite(np.asarray(wh)).all()


def test_simulate_outputs_matches_history_path(sim):
    """Long-horizon online-output mode (two-level checkpointed scan, no
    materialized history): values AND thickness gradients must match the
    plain-history path; checkpointing must not perturb the adjoint."""
    import jax

    th = sim.t_array
    fh = jnp.asarray(sim.f_history)
    wh = sim.simulate(th, fh)
    se_hist = sim.strain_energy_history(wh, th)

    out = sim.simulate_outputs(th, fh, segment_len=5, with_residuals=True)
    # N_t per-step scalars (history row 0 is the zero initial condition)
    np.testing.assert_allclose(np.asarray(out["energy_history"]),
                               np.asarray(se_hist)[1:], rtol=1e-9)
    assert abs(float(out["total_strain_energy"])
               - float(jnp.sum(se_hist))) <= 1e-9 * float(jnp.sum(se_hist))
    np.testing.assert_allclose(np.asarray(out["w_final"]),
                               np.asarray(wh)[-1], rtol=0, atol=1e-12)
    tips = np.asarray([sim.tip_disp(w) for w in np.asarray(wh)[1:]])
    np.testing.assert_allclose(np.asarray(out["tip_history"]), tips,
                               rtol=1e-10, atol=1e-14)
    assert np.all(np.asarray(out["res_history"]) < 1e-9)

    # default segment choice: nearest divisor of N_t to sqrt(N_t)
    out_d = sim.simulate_outputs(th, fh)
    np.testing.assert_allclose(float(out_d["total_strain_energy"]),
                               float(out["total_strain_energy"]), rtol=1e-12)

    g_hist = jax.grad(
        lambda t: jnp.sum(sim.strain_energy_history(sim.simulate(t, fh), t))
    )(th)
    g_onl = jax.grad(
        lambda t: sim.simulate_outputs(t, fh, segment_len=5)[
            "total_strain_energy"])(th)
    np.testing.assert_allclose(np.asarray(g_onl), np.asarray(g_hist),
                               rtol=1e-8)


def test_simulate_outputs_pnorm_history(sim):
    """Per-step stress p-norm emission (the time-resolved constraint of
    stress-constrained gust optimization): must match the history path's
    per-step pnorm_stress, with a working thickness gradient."""
    import jax

    th = sim.t_array
    fh = jnp.asarray(sim.f_history)
    out = sim.simulate_outputs(th, fh, segment_len=5,
                               stress_pnorm=(1e-6, 20))
    wh = sim.simulate(th, fh)
    pn_ref = np.asarray([
        float(sim.pnorm_stress(w, th, m=1e-6, rho=20))
        for w in np.asarray(wh)[1:]
    ])
    np.testing.assert_allclose(np.asarray(out["pnorm_history"]), pn_ref,
                               rtol=1e-9)

    g = jax.grad(lambda t: jnp.max(
        sim.simulate_outputs(t, fh, segment_len=5,
                             stress_pnorm=(1e-6, 20))["pnorm_history"]))(th)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.linalg.norm(np.asarray(g)) > 0
