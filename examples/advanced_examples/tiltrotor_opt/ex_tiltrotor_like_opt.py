"""Tiltrotor-workload analogue: bay-wise thickness optimization of a
rib-stiffened wing shell under BOTH an aggregated-stress constraint and a
maximum-displacement constraint.

The reference's tiltrotor example (ex_tiltrotor_shell.py) drives
`RMShellModel` from a CADDEE geometry pipeline with max_stress = 350 MPa,
max_displacement = 0.55 m, and thickness variables per structural BAY
(utils.py `construct_thickness_function` groups cells between ribs).
CADDEE/lsdo_function_spaces are external geometry packages (out of rebuild
scope; SURVEY.md §2.2) — this analogue keeps the exact shell-side workload
shape: few grouped design variables mapped linearly onto per-cell
thickness, a stress aggregate, and a smooth displacement aggregate, all
solved through the penalty-BC band-Cholesky path on an unstructured wing.

Design variables: one thickness per spanwise bay (between rib stations),
split into skin/rib groups. thickness = P @ h_bay is a jnp matmul, so the
whole chain stays differentiable end-to-end.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

import numpy as np
import jax.numpy as jnp

from femo_alpha_tpu.mesh import createWingShellMesh
from femo_alpha_tpu.mesh.wing import RIB_TAG, SKIN_TAG
from femo_alpha_tpu.models import RMShellModel
from femo_alpha_tpu.opt import OptimizationProblem

# sized for a CPU demo; scale n_chord/n_span freely on device
n_chord, n_span = 6, 12
rib_stations = (4, 8)
mesh = createWingShellMesh(n_chord=n_chord, n_span=n_span,
                           rib_stations=rib_stations, shuffle_seed=3)
nel, nn = mesh.n_cells, mesh.n_nodes

model = RMShellModel(mesh, shell_bc_func=lambda x: x[:, 1] < 1e-9,
                     element_wise_material=True,
                     mesh_tags={t: np.asarray(idx) for t, idx in
                                mesh.cell_tags.items()})

# ---- bay-wise thickness parameterization (the tiltrotor DV layout) ------
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
# DV layout: [skin bay 0..n_bays-1, rib group]
n_dv = n_bays + 1
P = np.zeros((nel, n_dv))
for c in range(nel):
    P[c, n_bays if is_rib[c] else int(cell_bay[c])] = 1.0
P = jnp.asarray(P)

eta = np.clip(np.asarray(mesh.coords[:, 1]) / span, 0.0, 1.0)
pressure = np.zeros((nn, 3))
pressure[:, 2] = 2500.0 * np.sqrt(1.0 - eta**2)  # elliptic-ish lift
pressure = jnp.asarray(pressure)
base = dict(E=jnp.full(nel, 69e9), nu=jnp.full(nel, 0.33),
            density=jnp.full(nel, 2700.0))


def ev(dv):
    th = P @ dv["h_bay"]
    out = model.evaluate(pressure, thickness=th, is_pressure=True, **base)
    # smooth max-displacement aggregate (p-norm of nodal |u_z|) — the
    # tiltrotor max_displacement constraint, made SLSQP-friendly
    uz = out.disp_extracted[:, 2]
    p = 20.0
    out.max_disp = jnp.sum(jnp.abs(uz) ** p) ** (1.0 / p)
    return out


h0 = 0.006
dv0 = {"h_bay": h0 * np.ones(n_dv)}
out0 = ev({"h_bay": jnp.asarray(dv0["h_bay"])})
mass0, agg0, d0 = (float(out0.mass), float(out0.aggregated_stress),
                   float(out0.max_disp))
print(f"baseline: mass {mass0:.3f} kg, aggregated stress {agg0:.4g} Pa, "
      f"max disp {d0:.5f} m")
stress_limit = 1.05 * agg0
disp_limit = 0.9 * d0  # force both constraints into play

prob = OptimizationProblem(ev)
prob.add_design_variable("h_bay", dv0["h_bay"], lower=0.002, upper=0.02)
prob.set_objective("mass", scaler=1.0 / mass0)
prob.add_constraint("aggregated_stress", upper=stress_limit,
                    scaler=1.0 / agg0)
prob.add_constraint("max_disp", upper=disp_limit, scaler=1.0 / d0)
dvs, res = prob.solve(maxiter=40, ftol=1e-9)

out = ev(dvs)
print(f"optimized: mass {float(out.mass):.3f} kg "
      f"(stress {float(out.aggregated_stress):.4g} <= {stress_limit:.4g}, "
      f"max disp {float(out.max_disp):.5f} <= {disp_limit:.5f})")
print("bay thicknesses [skin bays..., ribs]:",
      np.round(np.asarray(dvs["h_bay"]), 5))
# per-tag stress (skin vs rib), the lpc/tiltrotor reporting shape.
# pnorm_stress_<tag> is the raw integral sum((m*sigma)^rho) (reference
# parity); report it in Pa via the same aggregation as aggregated_stress.
from femo_alpha_tpu.models.rm_shell.model import AggregatedStressModel

agg = AggregatedStressModel(model.m, model.rho)
print(f"aggregated stress skin (tag {SKIN_TAG}):",
      f"{float(agg.evaluate(getattr(out, f'pnorm_stress_{SKIN_TAG}'))):.4g} Pa")
print(f"aggregated stress rib  (tag {RIB_TAG}):",
      f"{float(agg.evaluate(getattr(out, f'pnorm_stress_{RIB_TAG}'))):.4g} Pa")
