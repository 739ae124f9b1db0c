"""Thickness optimization on an unstructured wing through the penalty-BC +
band-Cholesky path — the reference's pav workload shape
(ex_pav_shell_w_caddee.py:438-456: min mass s.t. aggregated stress).
The .msh file-read path is covered by test_wing_gust; here a small
in-memory wing keeps the SLSQP loop affordable."""

import numpy as np
import jax.numpy as jnp

from femo_alpha_tpu.mesh import createWingShellMesh
from femo_alpha_tpu.models import RMShellModel
from femo_alpha_tpu.opt import OptimizationProblem


def test_wing_thickness_opt_band_path():
    mesh = createWingShellMesh(n_chord=6, n_span=12, rib_stations=(6,),
                               shuffle_seed=3)
    nel, nn = mesh.n_cells, mesh.n_nodes
    model = RMShellModel(mesh, shell_bc_func=lambda x: x[:, 1] < 1e-9,
                         element_wise_material=True, record=False)
    assert model.PENALTY_BC and not getattr(mesh, "structured", False)

    span = float(np.max(mesh.coords[:, 1]))
    eta = np.clip(np.asarray(mesh.coords[:, 1]) / span, 0.0, 1.0)
    pressure = np.zeros((nn, 3))
    pressure[:, 2] = 2000.0 * np.sqrt(1.0 - eta**2)
    base = dict(E=jnp.full(nel, 69e9), nu=jnp.full(nel, 0.33),
                density=jnp.full(nel, 2700.0))

    def ev(dv):
        return model.evaluate(jnp.asarray(pressure),
                              thickness=dv["thickness"],
                              is_pressure=True, **base)

    h0 = 0.006
    out0 = ev({"thickness": jnp.full(nel, h0)})
    mass0 = float(out0.mass)
    agg0 = float(out0.aggregated_stress)
    limit = 1.10 * agg0  # feasible start, constraint becomes active

    prob = OptimizationProblem(ev)
    prob.add_design_variable("thickness", h0 * np.ones(nel),
                             lower=0.002, upper=0.02)
    prob.add_constraint("aggregated_stress", upper=limit, scaler=1.0 / agg0)
    prob.set_objective("mass", scaler=1.0 / mass0)
    dvs, res = prob.solve(maxiter=200, ftol=1e-8, report=False)

    assert res.success, res.message
    out = ev({"thickness": jnp.asarray(dvs["thickness"])})
    mass = float(out.mass)
    agg = float(out.aggregated_stress)
    # converged design: much lighter, stress constraint active (not violated)
    assert mass < 0.6 * mass0, (mass, mass0)
    assert agg <= 1.001 * limit, (agg, limit)
    assert np.all(np.asarray(dvs["thickness"]) >= 0.002 - 1e-12)
