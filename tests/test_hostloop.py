"""Hostloop execution path (adjoint/hostloop.py) equivalence: the
host-orchestrated chunked-CG staging — the TPU product path, where one
fused f64-Krylov program is a compile-time pathology — must reproduce the
fused staged custom_vjp pipeline's values and gradients.

The library path is exercised end-to-end (RMShellModel.evaluate +
jax.grad over compliance w.r.t. thickness) at a size where the model picks
CG + geometric MG (n_dofs > 6000), which is the configuration hostloop
serves."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.mesh import createRectangleMesh
from femo_alpha_tpu.models import RMShellModel


NX, NY = 64, 16


def _build(execution):
    os.environ["FEMO_HOSTLOOP"] = "1" if execution == "hostloop" else "0"
    try:
        mesh = createRectangleMesh(NX, NY, (0, 0), (10.0, 2.0), "quad",
                                   gdim=3)
        model = RMShellModel(
            mesh, shell_bc_func=lambda x: x[:, 0] < 1e-12,
            element_wise_material=True, PENALTY_BC=False)
    finally:
        os.environ.pop("FEMO_HOSTLOOP", None)
    return model


def _run(model):
    nel, nn = model.nel, model.nn
    f = jnp.zeros(3 * nn).at[2::3].set(2.0)
    E = jnp.full(nel, 4.32e8)
    nu = jnp.zeros(nel)
    rho = jnp.full(nel, 100.0)
    th = jnp.full(nel, 0.2)

    def J(t):
        out = model.evaluate(f, t, E, nu, rho, is_pressure=True)
        return out.compliance, out.disp_solid

    (val, u), g = jax.value_and_grad(J, has_aux=True)(th)
    return float(val), np.asarray(u), np.asarray(g)


def test_hostloop_engaged_and_matches_fused():
    m_host = _build("hostloop")
    pde = m_host.fea.states["disp_solid"].pde
    assert pde._hostloop_enabled, "hostloop did not engage (env plumb broke)"
    assert pde.solver_opts.get("method", "cg") == "cg", (
        "test size picked a dense solver; enlarge the mesh")
    J_h, u_h, g_h = _run(m_host)

    m_fused = _build("fused")
    assert not m_fused.fea.states["disp_solid"].pde._hostloop_enabled
    J_f, u_f, g_f = _run(m_fused)

    assert abs(J_h - J_f) < 1e-9 * abs(J_f)
    assert np.linalg.norm(u_h - u_f) < 1e-8 * np.linalg.norm(u_f)
    assert np.linalg.norm(g_h - g_f) < 1e-6 * np.linalg.norm(g_f)


def _params_for(m):
    nel = m.nel
    return {
        "thickness": jnp.full(nel, 0.2),
        "E": jnp.full(nel, 4.32e8),
        "nu": jnp.zeros(nel),
        "uhat": jnp.zeros(3 * m.nn),
        "F_solid": jnp.zeros(3 * m.nn).at[2::3].set(2.0),
    }


def test_hostloop_true_residual_at_floor():
    """The hostloop must deliver a TRUE assembly residual at (or below) the
    residual-measurement floor eps*|||A||u|+|b||| — the smallest value ANY
    f64 solver (incl. a SuperLU/MUMPS direct factorization) can show on
    this metric (tools/floor_experiment.py) — and its solution must match
    a host-f64 direct solve nodally to the 1e-8 BASELINE.md bar."""
    m = _build("hostloop")
    pde = m.fea.states["disp_solid"].pde
    J_h, u_h, _ = _run(m)

    params = _params_for(m)
    u = jnp.asarray(u_h)
    rn = float(jnp.linalg.norm(pde.residual(u, params)))
    r0 = float(jnp.linalg.norm(pde.residual(jnp.zeros(pde.n_dofs), params)))
    # measured CPU floor at 64x16 is ~1.3e-8; predictor eps*rho ~ 3.0e-8
    assert rn / r0 < 4e-8, rn / r0

    from femo_alpha_tpu.utils.quality import direct_crosscheck

    cc = direct_crosscheck(pde, params, u_h)
    assert cc["nodal_l2"] < 1e-8, cc
    # backward-stable at machine-precision class, like the direct solve:
    # componentwise backward error for a backward-stable f64 solve is
    # O(n)*eps (n = 16k dofs here -> ~3.6e-12); observed ~1e-14-3e-14
    # depending on where the refinement loop's floor-based exit lands
    assert cc["omega"] < 1000 * np.finfo(np.float64).eps, cc


def test_hostloop_tpu_arithmetic_config_nodal_accuracy():
    """The TPU solver arithmetic — float-float (df) CG vector state + f32
    geometric-MG hierarchy — forced on CPU: the refinement loop must still
    deliver a solution that matches a true-f64 direct solve nodally to the
    1e-8 bar (round-3 VERDICT: the old test only covered native-f64 CPU,
    where the bar is trivially met)."""
    os.environ["FEMO_CG_DF"] = "1"
    os.environ["FEMO_MG_F32"] = "1"
    try:
        m = _build("hostloop")
        pde = m.fea.states["disp_solid"].pde
        assert pde._hostloop_enabled
        J_h, u_h, _ = _run(m)

        params = _params_for(m)
        from femo_alpha_tpu.utils.quality import direct_crosscheck

        cc = direct_crosscheck(pde, params, u_h)
        assert cc["nodal_l2"] < 1e-8, cc
        # the df arithmetic's unit roundoff is ~2^-48; refinement against
        # f64 assembly truth must land omega well below the df floor
        assert cc["omega"] < 1e-9, cc
    finally:
        os.environ.pop("FEMO_CG_DF", None)
        os.environ.pop("FEMO_MG_F32", None)


def test_hostloop_under_jit_falls_back_to_fused():
    """Inside a jitted program the inputs are tracers; hostloop must defer
    to the fused staged programs, keeping jit pipelines working."""
    m = _build("hostloop")
    nel, nn = m.nel, m.nn
    f = jnp.zeros(3 * nn).at[2::3].set(2.0)
    E, nu = jnp.full(nel, 4.32e8), jnp.zeros(nel)
    rho, th = jnp.full(nel, 100.0), jnp.full(nel, 0.2)

    from femo_alpha_tpu.fea.pipeline import compile_pipeline

    def J(t):
        out = m.evaluate(f, t, E, nu, rho, is_pressure=True)
        return out.compliance, out.disp_solid

    # compile_pipeline detects the hostloop PDE and runs the pipeline
    # eagerly (staged programs + host glue) instead of fusing
    vg = compile_pipeline(jax.value_and_grad(J, has_aux=True), (th,))
    (val, _), g = vg(th)
    (val2, _), g2 = jax.value_and_grad(J, has_aux=True)(th)
    assert abs(float(val) - float(val2)) < 1e-9 * abs(float(val2))
    assert np.allclose(np.asarray(g), np.asarray(g2), rtol=1e-9, atol=1e-14)


def test_solver_telemetry_persists_and_maxiter_bounded(tmp_path,
                                                       monkeypatch):
    """Cold-start economics: (a) the adapted inner_attain and the
    converged-iteration history survive process boundaries via the setup
    disk cache (the driver bench runs in fresh children by design), and
    (b) the default iteration ceiling is a bounded backstop — the old
    min(10*n, 200k) default let one stalled 988k-dof solve burn ~5.5 h of
    128-trip chunks before giving up."""
    from femo_alpha_tpu.adjoint.hostloop import HostloopPrograms

    # the fabricated telemetry below must never land in the REAL shared
    # setup cache: a loosened inner_attain persisted under this problem's
    # key would cost accuracy-chasing iterations for any later real run
    monkeypatch.setenv("FEMO_SETUP_CACHE_DIR", str(tmp_path))

    m = _build("hostloop")
    pde = m.fea.states["disp_solid"].pde
    hl = pde._hostloop
    assert hl.maxiter <= 8192

    # simulate a CONFIRMED adapted state (2+ consecutive stalls passed the
    # persist gate), persist, and reload through a fresh object: the load
    # applies the wash-out decay toward the default (advisor r4 — a raise
    # must not be a permanent one-way ratchet across processes)
    hl.inner_attain = 3.3e-6
    hl._attain_persist = 3.3e-6
    hl._est = {"fwd0": 24, "adj1": 7}
    hl._store_telemetry()
    fresh = object.__new__(HostloopPrograms)
    fresh._telem_key = hl._telem_key
    fresh._attain_explicit = False
    fresh.inner_attain = 1.5e-7
    fresh._est = {}
    fresh._load_telemetry()
    expect = 1.5e-7 + HostloopPrograms._ATTAIN_LOAD_DECAY * (3.3e-6 - 1.5e-7)
    assert fresh.inner_attain == pytest.approx(expect)
    assert fresh._est == {"fwd0": 24, "adj1": 7}

    # an explicit user inner_attain wins over the persisted adaptation
    expl = object.__new__(HostloopPrograms)
    expl._telem_key = hl._telem_key
    expl._attain_explicit = True
    expl.inner_attain = 9.9e-9
    expl._est = {}
    expl._load_telemetry()
    assert expl.inner_attain == pytest.approx(9.9e-9)
    assert expl._est == {"fwd0": 24, "adj1": 7}


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
