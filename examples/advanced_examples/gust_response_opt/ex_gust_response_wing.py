"""Gust response on an aircraft wing shell MESH FILE — the reference's
ex_gust_response_opt.py workload (Cessna 172 skin, 1-cos gust, total
strain energy + mass) driven end-to-end from a gmsh .msh file.

The reference's shipped cessna_172_shell_meshes/*.msh are git-lfs pointer
stubs (no payload in the snapshot), so its regression constants
(ex_gust_response_opt.py:57-64: E_total 0.11631866 @ dt=0.005, N=40) are
tied to a mesh we cannot load; this example runs the same pipeline on the
committed c172-scale generated wing (tests/data/c172_like_wing_648.msh,
648 quads — c172_650.msh scale), clamped at the root section, with the
same dt/Nsteps study point and material class.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

import numpy as np
import jax.numpy as jnp

from femo_alpha_tpu.mesh import readFEAMesh
from femo_alpha_tpu.models.dynamic_rm_shell import (
    PlateSim, StateOperation, TotalStrainEnergyOperation, VolumeOperation)

E, nu, rho = 69e9, 0.33, 2700.0  # aluminum (gust example material class)
h0 = 0.003
dt, Nsteps = 0.005, 40  # the reference's time-step study point

MESH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "..", "..", "..", "tests", "data",
                    "c172_like_wing_648.msh")
mesh = readFEAMesh(MESH)
nn, nel = mesh.n_nodes, mesh.n_cells
print(f"wing: {nel} cells, {nn} nodes (from {os.path.basename(MESH)})")

# clamp the root section (y = 0 plane)
sim = PlateSim(mesh, E, nu, rho, dt, Nsteps, element_wise_thickness=True,
               custom_bc_func=lambda x: x[:, 1] < 1e-9, quad_deg=4)
print(f"mixed dofs: {sim.fe_dofs}, step solver: {sim.solver_method}")

# 1-cos vertical gust pressure over the first half of the horizon
t_axis = np.arange(Nsteps + 1) * dt
gust = 0.5 * (1 - np.cos(2 * np.pi * np.clip(t_axis / (Nsteps * dt / 2),
                                             0, 1)))
f_hist = np.zeros((Nsteps + 1, nn * 3))
base_pressure = 800.0  # N/m^2
for i, g in enumerate(gust):
    f = np.zeros((nn, 3))
    f[:, 2] = base_pressure * g
    f_hist[i] = f.reshape(-1)
sim.update_f_history(f_hist)
sim.update_t(np.full(sim.num_var, h0))

state_op = StateOperation(sim)
tse_op = TotalStrainEnergyOperation(sim)
vol_op = VolumeOperation(sim)

wh = state_op.evaluate(sim.t_array)
E_total = float(tse_op.evaluate(wh, sim.t_array))
mass = rho * float(vol_op.evaluate(sim.t_array))
print(f"total strain energy {E_total:.8g}, wing skin mass {mass:.4f} kg")

# adjoint: dE_total/d(thickness) through the whole transient (scan AD)
import jax


def J(t):
    return jnp.reshape(tse_op.evaluate(state_op.evaluate(t), t), ())


g = jax.grad(J)(sim.t_array)
print(f"|dE/dh| = {float(jnp.linalg.norm(g)):.6g} "
      f"(finite: {bool(jnp.all(jnp.isfinite(g)))})")
