"""LPC-workload analogue: transient gust-response optimization of a
rib-stiffened wing with bay-wise thickness variables, a smooth-max
displacement objective, a mass constraint, and per-bay panel-buckling
margin constraints.

The reference's lift-plus-cruise example (ex_lpc_gust_response_opt.py)
drives PlateSim from a CADDEE/VLM/lsdo_airfoil pipeline (all external
geometry/aero packages — out of rebuild scope, SURVEY.md §2.2). The
shell-side workload it exercises (the part this analogue keeps exactly):

- bay-wise thickness design variables between rib stations
  (utils.py `construct_thickness_function`), split skin/rib groups
- a 1-cos gust force history through the implicit-midpoint transient
- minimize smooth-max displacement over the WHOLE history subject to a
  mass budget (ex_lpc_gust_response_opt.py:458-461 `minimize_max_disp`
  branch: `csdl.maximum(|scaler*disp_history|, rho=300)/scaler`,
  `wing_mass <= max_mass`)
- self-weight plus boom loads: boom weights enter as point forces at the
  rib-station attachment nodes, converted to an equivalent force FIELD by
  the force->pressure mass-matrix solve (rm_shell_model.py:418-421); the
  reference routes boom dynamics through external aframe beam models
- panel buckling: the reference IMPORTS `compute_buckling_loads`
  (utils.py:398-434) but never calls it in the snapshot — here the same
  handbook formulas (models/rm_shell/buckling.py) are live per-bay margin
  constraints at the gust peak, with stress_cf=1.5 correcting the
  aggregate to peak stress (ex_lpc_gust_response_opt.py:55).

Everything is one differentiable jnp chain: thickness -> scan transient ->
smooth-max disp / peak von Mises -> margins, so SLSQP gets exact adjoint
gradients through the whole time history (scan AD; the reference needed an
816-line hand-written O(N_t^2) adjoint for this).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

from femo_alpha_tpu.mesh import createWingShellMesh
from femo_alpha_tpu.mesh.wing import RIB_TAG
from femo_alpha_tpu.models.dynamic_rm_shell import PlateSim, StateOperation
from femo_alpha_tpu.models.rm_shell import buckling as bk
from femo_alpha_tpu.opt import OptimizationProblem

# ---------------------------------------------------------------- parameters
E, nu, rho = 69e9, 0.33, 2700.0          # aluminum
dt, Nsteps = 0.005, 16                   # reference dt; short CPU horizon
V_p_pressure = 400.0                     # gust peak pressure, N/m^2
boom_mass = 45.0                         # kg per boom (lpc boom_masses scale)
stress_cf = 1.5                          # softmax->peak stress correction
rho_sm = 300.0                           # the reference's softmax rho
g = 9.81

# sized for a CPU demo; scale n_chord/n_span freely on device
n_chord, n_span = 6, 10
span, root_chord, taper, sweep = 10.0, 1.6, 0.5, 0.3
rib_stations = (3, 7)

mesh = createWingShellMesh(n_chord=n_chord, n_span=n_span, span=span,
                           root_chord=root_chord, taper=taper, sweep=sweep,
                           rib_stations=rib_stations, shuffle_seed=11)
nel, nn = mesh.n_cells, mesh.n_nodes

sim = PlateSim(mesh, E, nu, rho, dt, Nsteps, element_wise_thickness=True,
               custom_bc_func=lambda x: x[:, 1] < 1e-9,
               add_self_weight=True, quad_deg=4)
print(f"wing: {nel} cells, {nn} nodes, {sim.fe_dofs} mixed dofs, "
      f"step solver: {sim.solver_method}")

# ---------------------------------------------- bay-wise DV parameterization
bay_edges = np.array([0.0] + [span * j / n_span for j in rib_stations]
                     + [span * 1.001])
cell_y = np.asarray(mesh.coords)[np.asarray(mesh.conn)].mean(axis=1)[:, 1]
cell_bay = np.searchsorted(bay_edges, cell_y, side="right") - 1
n_bays = len(bay_edges) - 1
is_rib = np.zeros(nel, dtype=bool)
rib_cells = mesh.cell_tags.get(RIB_TAG)
if rib_cells is not None:
    is_rib[np.asarray(rib_cells)] = True
P = np.zeros((nel, n_bays + 1))          # [skin bays..., rib group]
for c in range(nel):
    P[c, n_bays if is_rib[c] else int(cell_bay[c])] = 1.0
P = jnp.asarray(P)
bay_cell_masks = [jnp.asarray(((cell_bay == b) & ~is_rib).astype(np.float64))
                  for b in range(n_bays)]


# bay rectangle approximations for the buckling formulas: between rib
# stations, panel width b = local chord (top-skin panel), length a = bay
# span — corner points from the generator's planform (analytic; the
# reference evaluates its CADDEE surface at the same 4 corners)
def planform_corner(y, le):
    t = y / span
    chord = root_chord * (1.0 - (1.0 - taper) * t)
    x = sweep * span * t + (0.0 if le else chord)
    return np.array([x, y, 0.0])


bay_corners = []
for b in range(n_bays):
    y0, y1 = bay_edges[b], min(bay_edges[b + 1], span)
    bay_corners.append(np.stack([planform_corner(y0, True),
                                 planform_corner(y0, False),
                                 planform_corner(y1, True),
                                 planform_corner(y1, False)]))

# ------------------------------------------------------- gust force history
t_axis = np.arange(Nsteps + 1) * dt
gust = 0.5 * (1 - np.cos(2 * np.pi * np.clip(t_axis / (Nsteps * dt), 0, 1)))
eta = np.clip(np.asarray(mesh.coords[:, 1]) / span, 0.0, 1.0)
lift_shape = np.sqrt(1.0 - eta**2)       # elliptic-ish spanwise loading

# boom point weights at the rib-station LE attachment nodes -> equivalent
# force field via the mass-matrix solve (the reference's is_pressure=False
# path)
boom_nodes = []
for j in rib_stations:
    y_st = span * j / n_span
    d = np.linalg.norm(np.asarray(mesh.coords)
                       - planform_corner(y_st, True), axis=1)
    boom_nodes.append(int(np.argmin(d)))
F_boom = np.zeros(nn * 3)
for b in boom_nodes:
    F_boom[3 * b + 2] = -boom_mass * g
to_field = sim.pde.make_force_to_pressure_solver()
p_boom = np.asarray(to_field(jnp.asarray(F_boom)))

f_hist = np.zeros((Nsteps + 1, nn * 3))
for i, gv in enumerate(gust):
    f = np.zeros((nn, 3))
    f[:, 2] = V_p_pressure * gv * lift_shape
    f_hist[i] = f.reshape(-1) + p_boom
sim.update_f_history(f_hist)

state_op = StateOperation(sim)
i_peak = int(np.argmax(gust))
scale_0 = 1.0  # reset below to 1/max_disp(h0), the reference's disp scaler


def smooth_max(x):
    # csdl.maximum(|scale*x|, rho=300)/scale — logsumexp soft maximum
    z = rho_sm * scale_0 * jnp.abs(x)
    return jax.nn.logsumexp(z) / (rho_sm * scale_0)


def ev(dv):
    th = P @ dv["h_bay"]
    wh = state_op.evaluate(th).reshape(sim.time_levels, sim.fe_dofs)
    uz = wh[:, : 3 * nn].reshape(sim.time_levels, nn, 3)[:, :, 2]
    out = type("Out", (), {})()
    out.mass = rho * sim.volume(th)
    out.max_disp = smooth_max(uz)
    # per-bay buckling margins at the gust peak: von Mises (DG1, cellwise
    # rows) -> bay mean -> corrected by stress_cf -> handbook margin
    vm_cell = sim.von_Mises_stress(wh[i_peak], th).reshape(nel, -1).mean(1)
    margins = []
    for b in range(n_bays):
        m = bay_cell_masks[b]
        sig = stress_cf * jnp.vdot(vm_cell, m) / jnp.sum(m)
        margins.append(bk.bay_buckling_margins(
            sig, 0.3 * sig, E, nu, dv["h_bay"][b], bay_corners[b]))
    out.buckling_margin = jnp.stack(margins)
    out.min_margin = jnp.min(out.buckling_margin)
    return out


h0 = 0.006
dv0 = {"h_bay": h0 * np.ones(n_bays + 1)}
base = ev({"h_bay": jnp.asarray(dv0["h_bay"])})
scale_0 = 1.0 / float(base.max_disp)
base = ev({"h_bay": jnp.asarray(dv0["h_bay"])})   # rescaled softmax
mass0, d0 = float(base.mass), float(base.max_disp)
print(f"baseline: mass {mass0:.3f} kg, smooth-max disp {d0:.5f} m, "
      f"bay margins {np.round(np.asarray(base.buckling_margin), 3)}")

prob = OptimizationProblem(ev)
prob.add_design_variable("h_bay", dv0["h_bay"], lower=0.0015, upper=0.02)
prob.set_objective("max_disp", scaler=1.0 / d0)        # minimize_max_disp
prob.add_constraint("mass", upper=mass0, scaler=1.0 / mass0)
prob.add_constraint("buckling_margin", lower=0.0)
dvs, res = prob.solve(maxiter=30, ftol=1e-8)

out = ev(dvs)
print(f"optimized: smooth-max disp {float(out.max_disp):.5f} m "
      f"(baseline {d0:.5f}), mass {float(out.mass):.3f} <= {mass0:.3f} kg, "
      f"min buckling margin {float(out.min_margin):.4f} >= 0")
print("bay thicknesses [skin bays..., ribs]:",
      np.round(np.asarray(dvs["h_bay"]), 5))
