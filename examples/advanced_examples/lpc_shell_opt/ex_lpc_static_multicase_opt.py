"""LPC static shell optimization analogue: TWO load cases (+3g / -1g)
through one wing shell model, with per-case stress and tip-displacement
constraints and a mass objective.

The reference's lift-plus-cruise example
(examples/advanced_examples/lpc_shell_opt/ex_lpc_shell_w_caddee.py) wraps
`RMShellModel` in a CADDEE aircraft pipeline: VLM pressures for a +3g and
a -1g maneuver drive two shell solves of the same wing
(ex_lpc_shell_w_caddee.py:512-601), with max_stress = 350 MPa (scaler
1e-8), tip displacement within +/-0.55 m (scaler 1e2), minimum thickness
3e-4 m, initial 0.01 m (:31-37), and bay-grouped skin/rib thickness design
variables. CADDEE/VLM/BladeAD are external geometry/aero packages (out of
rebuild scope; SURVEY.md §2.2) — this analogue keeps the in-scope shell
workload exactly: one `RMShellModel` on an unstructured penalty-BC wing
(band-Cholesky solve path), evaluated once per load case inside the same
differentiable objective, both cases' aggregated stresses and tip
displacements constrained simultaneously.

Run (CPU demo size): python ex_lpc_static_multicase_opt.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

import numpy as np
import jax.numpy as jnp

from femo_alpha_tpu.mesh import createWingShellMesh
from femo_alpha_tpu.mesh.wing import RIB_TAG
from femo_alpha_tpu.models import RMShellModel
from femo_alpha_tpu.opt import OptimizationProblem

# reference constants (ex_lpc_shell_w_caddee.py:31-37)
MAX_STRESS = 350e6        # Pa
MAX_DISPLACEMENT = 0.55   # m  (scaled to this demo's small wing below)
MIN_THICKNESS = 0.0003    # m
INITIAL_THICKNESS = 0.01  # m
SYSTEM_MASS = 3617.0      # kg (sets the load scale: lift = n * m * g)
G = 9.81

# sized for a CPU demo; scale n_chord/n_span freely on device
n_chord, n_span = 6, 12
rib_stations = (4, 8)
mesh = createWingShellMesh(n_chord=n_chord, n_span=n_span,
                           rib_stations=rib_stations, shuffle_seed=3)
nel, nn = mesh.n_cells, mesh.n_nodes

model = RMShellModel(mesh, shell_bc_func=lambda x: x[:, 1] < 1e-9,
                     element_wise_material=True)

# ---- bay-wise skin + rib thickness DVs (the lpc DV grouping) ------------
span = float(np.max(mesh.coords[:, 1]))
bay_edges = np.array([0.0] + [span * j / n_span for j in rib_stations]
                     + [span * 1.001])
cell_y = np.asarray(mesh.coords)[np.asarray(mesh.conn)].mean(axis=1)[:, 1]
cell_bay = np.searchsorted(bay_edges, cell_y, side="right") - 1
n_bays = len(bay_edges) - 1
is_rib = np.zeros(nel, dtype=bool)
rib_cells = mesh.cell_tags.get(RIB_TAG)
if rib_cells is not None:
    is_rib[np.asarray(rib_cells)] = True
n_dv = n_bays + 1  # [skin bays..., rib group]
P = np.zeros((nel, n_dv))
for c in range(nel):
    P[c, n_bays if is_rib[c] else int(cell_bay[c])] = 1.0
P = jnp.asarray(P)

# ---- the two maneuver pressure fields -----------------------------------
# Elliptic spanwise lift carrying n * SYSTEM_MASS/2 * g per half wing
# (the VLM's role in the reference; here closed-form).
eta = np.clip(np.asarray(mesh.coords[:, 1]) / span, 0.0, 1.0)
shape = np.sqrt(1.0 - eta**2)
area = 1.0  # per-node pressure -> consistent load via the mass-matrix map
# scale so the +1g case roughly carries half the system weight over the
# demo wing's planform; the maneuver factor multiplies it
skin_cells = np.asarray(mesh.cell_tags.get(1))
planform = float(np.sum(
    np.linalg.norm(np.cross(
        np.asarray(mesh.coords)[np.asarray(mesh.conn)[skin_cells, 1]]
        - np.asarray(mesh.coords)[np.asarray(mesh.conn)[skin_cells, 0]],
        np.asarray(mesh.coords)[np.asarray(mesh.conn)[skin_cells, 3]]
        - np.asarray(mesh.coords)[np.asarray(mesh.conn)[skin_cells, 0]],
    ), axis=1)))
p1g = SYSTEM_MASS / 2.0 * G / max(planform, area)


def maneuver_pressure(n_factor):
    p = np.zeros((nn, 3))
    p[:, 2] = n_factor * p1g * shape
    return jnp.asarray(p)


CASES = {"plus_3g": maneuver_pressure(3.0), "minus_1g": maneuver_pressure(-1.0)}
base = dict(E=jnp.full(nel, 69e9), nu=jnp.full(nel, 0.33),
            density=jnp.full(nel, 2700.0))

# tip = the free-end (max-span) nodes; smooth |u_z| aggregate over them
tip_nodes = np.where(np.asarray(mesh.coords[:, 1]) > span * (1 - 1e-9))[0]


def ev(dv):
    th = P @ dv["h_bay"]
    out_all = None
    for name, pressure in CASES.items():
        out = model.evaluate(pressure, thickness=th, is_pressure=True,
                             **base)
        uz_tip = out.disp_extracted[tip_nodes, 2]
        tip_disp = jnp.sum(jnp.abs(uz_tip) ** 20.0) ** (1.0 / 20.0)
        if out_all is None:
            out_all = out  # mass/volume identical across cases
        setattr(out_all, f"{name}_stress", out.aggregated_stress)
        setattr(out_all, f"{name}_tip_disp", tip_disp)
    return out_all


dv0 = {"h_bay": INITIAL_THICKNESS * np.ones(n_dv)}
out0 = ev({"h_bay": jnp.asarray(dv0["h_bay"])})
mass0 = float(out0.mass)
print(f"baseline: mass {mass0:.3f} kg")
for name in CASES:
    print(f"  {name}: stress {float(getattr(out0, f'{name}_stress')):.4g} "
          f"Pa, tip |u_z| {float(getattr(out0, f'{name}_tip_disp')):.5f} m")

# demo wing is small+stiff: tighten the displacement bound so it's active,
# keeping the reference's constraint STRUCTURE (stress + disp per case)
disp_limit = min(MAX_DISPLACEMENT,
                 0.9 * float(getattr(out0, "plus_3g_tip_disp")))

prob = OptimizationProblem(ev)
prob.add_design_variable("h_bay", dv0["h_bay"], lower=MIN_THICKNESS,
                         upper=0.02)
prob.set_objective("mass", scaler=1.0 / mass0)
for name in CASES:
    # reference scalers: stress 1e-8, displacement 1e2
    prob.add_constraint(f"{name}_stress", upper=MAX_STRESS, scaler=1e-8)
    prob.add_constraint(f"{name}_tip_disp", upper=disp_limit,
                        scaler=1.0 / disp_limit)
dvs, res = prob.solve(maxiter=40, ftol=1e-9)

out = ev(dvs)
print(f"optimized: mass {float(out.mass):.3f} kg")
for name in CASES:
    print(f"  {name}: stress {float(getattr(out, f'{name}_stress')):.4g} "
          f"<= {MAX_STRESS:.3g} Pa, tip |u_z| "
          f"{float(getattr(out, f'{name}_tip_disp')):.5f} <= "
          f"{disp_limit:.5f} m")
print("bay thicknesses [skin bays..., ribs]:",
      np.round(np.asarray(dvs["h_bay"]), 5))
