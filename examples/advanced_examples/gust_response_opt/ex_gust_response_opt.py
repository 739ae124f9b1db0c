"""Gust-response thickness optimization (1-cos gust load history) — the
workload pattern of the reference's ex_gust_response_opt.py
(examples/advanced_examples/gust_response_opt/), on a built-in plate wing
stand-in (the reference drives a Cessna 172 shell mesh through CADDEE/VLM;
the interface contract — nodal force history in, strain-energy/mass
objectives out — is identical).

Minimize mass subject to a total-strain-energy constraint over the gust.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

import numpy as np
import jax.numpy as jnp

from femo_alpha_tpu.mesh import StructuredQuadMesh
from femo_alpha_tpu.models.dynamic_rm_shell import (
    PlateSim, StateOperation, TotalStrainEnergyOperation, VolumeOperation)
from femo_alpha_tpu.opt import OptimizationProblem

E, nu, rho = 69e9, 0.33, 2700.0  # aluminum wing-skin-like
h0 = 0.005
span, chord = 6.0, 1.0
dt, Nsteps = 0.005, 40  # the reference's time-step study point

mesh = StructuredQuadMesh(24, 4, (0, 0), (span, chord), gdim=3)
nn, nel = mesh.n_nodes, mesh.n_cells
sim = PlateSim(mesh, E, nu, rho, dt, Nsteps, element_wise_thickness=True,
               custom_bc_func=lambda x: x[:, 0] < 1e-12, quad_deg=4)

# 1-cos gust: lift pressure ramping over the first half of the horizon
t_axis = np.arange(Nsteps + 1) * dt
gust = 0.5 * (1 - np.cos(2 * np.pi * np.clip(t_axis / (Nsteps * dt / 2),
                                             0, 1)))
f_hist = np.zeros((Nsteps + 1, nn * 3))
base_pressure = 2000.0  # N/m^2
for i, g in enumerate(gust):
    f = np.zeros((nn, 3))
    f[:, 2] = base_pressure * g
    f_hist[i] = f.reshape(-1)
sim.update_f_history(f_hist)
sim.update_t(np.full(nel, h0))

state_op = StateOperation(sim)
tse_op = TotalStrainEnergyOperation(sim)
vol_op = VolumeOperation(sim)

wh = state_op.evaluate(sim.t_array)
E_total0 = float(tse_op.evaluate(wh, sim.t_array))
mass0 = rho * float(vol_op.evaluate(sim.t_array))
print(f"baseline: total strain energy {E_total0:.6g}, mass {mass0:.4f} kg")

max_strain_energy = 1.5 * E_total0


def ev(dv):
    wh = state_op.evaluate(dv["thickness"])
    return {
        "total_strain_energy": tse_op.evaluate(wh, dv["thickness"]),
        "mass": rho * vol_op.evaluate(dv["thickness"]),
    }


prob = OptimizationProblem(ev)
prob.add_design_variable("thickness", h0 * np.ones(nel), lower=1e-3,
                         upper=0.05)
prob.set_objective("mass", scaler=1.0 / mass0)
prob.add_constraint("total_strain_energy", upper=max_strain_energy)
dvs, res = prob.solve(maxiter=40, ftol=1e-7)
out = ev(dvs)
print(f"optimized mass: {float(out['mass']):.4f} kg "
      f"(constraint E <= {max_strain_energy:.6g}, "
      f"achieved {float(out['total_strain_energy']):.6g})")

# ---- long-horizon variant -------------------------------------------------
# For gust horizons where the (time_levels, fe_dofs) history no longer fits
# (1M dofs x hundreds of steps), the ONLINE-output mode computes the same
# objective/constraint without materializing the history: two-level
# checkpointed scan, adjoint memory O(sqrt(N_t) * n). Gradients match the
# history path to 1e-8 (tests/test_dynamic_shell.py).
onl = sim.simulate_outputs(jnp.asarray(dvs["thickness"]),
                           jnp.asarray(sim.f_history))
print(f"online-mode check: total strain energy "
      f"{float(onl['total_strain_energy']):.6g} "
      f"(history path {float(out['total_strain_energy']):.6g})")
