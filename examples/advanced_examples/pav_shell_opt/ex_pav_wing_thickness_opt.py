"""PAV wing skin thickness optimization from a gmsh .msh file — the
structural core of the reference's ex_pav_shell_w_caddee.py (mass
objective, aggregated-stress constraint, penalty clamped root) without the
external CADDEE/VLM stack.

The reference's shipped pav_wing/pav_wing_v2_caddee_mesh_2374_quad.xdmf is
a git-lfs pointer stub in the snapshot, so this runs the same pipeline on
the committed pav-scale generated wing (tests/data/pav_like_wing_2388.msh,
2388 quads — same element count class), penalty-clamped at the root rib
(y=0), under an elliptic spanwise pressure load.

Pipeline parity (reference ex_pav_shell_w_caddee.py:353-456):
  RMShellModel(mesh, PENALTY_BC=True).evaluate(pressures, h, E, nu, rho)
  -> mass, aggregated_stress, disp_extracted;
  min mass  s.t.  aggregated_stress <= sigma_y / SF,  h in [h_min, h_max]
The unstructured + penalty-BC configuration is solved by the RCM band
Cholesky path (solvers/band.py) — the role MUMPS plays in the reference.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

import numpy as np
import jax.numpy as jnp

from femo_alpha_tpu.mesh import readFEAMesh
from femo_alpha_tpu.models import RMShellModel
from femo_alpha_tpu.opt import OptimizationProblem

run_check_derivatives = False
maxiter = int(os.environ.get("FEMO_PAV_MAXITER", "100"))

MESH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "..", "..", "..", "tests", "data",
                    "pav_like_wing_2388.msh")

# aluminum 7075-ish (the reference pav example's material class)
E_val, nu_val, rho_val = 71.7e9, 0.33, 2780.0
sigma_y, safety = 503.0e6, 1.5
h0, h_min, h_max = 0.005, 0.001, 0.02

mesh = readFEAMesh(MESH)
nel, nn = mesh.n_cells, mesh.n_nodes
span = float(np.max(mesh.coords[:, 1]))
print(f"pav wing: {nel} cells, {nn} nodes, span {span:.2f} m, "
      f"tags {sorted(mesh.cell_tags)}")

# per-physical-group stress outputs (skin=1, rib=2 from the .msh physical
# names) — the reference's tagged-subdomain pnorms (rm_shell_model.py:457-462,
# lpc workloads)
model = RMShellModel(mesh, shell_bc_func=lambda x: x[:, 1] < 1e-9,
                     element_wise_material=True, record=False,
                     mesh_tags={t: np.asarray(c)
                                for t, c in mesh.cell_tags.items()})

# elliptic spanwise lift distribution, ~2.5g pull-up on a 800 kg vehicle
eta = np.clip(np.asarray(mesh.coords[:, 1]) / span, 0.0, 1.0)
cp = np.sqrt(1.0 - eta**2)
pressure = np.zeros((nn, 3))
pressure[:, 2] = 4000.0 * cp

base = dict(E=jnp.full(nel, E_val), nu=jnp.full(nel, nu_val),
            density=jnp.full(nel, rho_val))


def ev(dv):
    return model.evaluate(jnp.asarray(pressure), thickness=dv["thickness"],
                          is_pressure=True, **base)


out0 = ev({"thickness": jnp.full(nel, h0)})
mass0 = float(out0.mass)
agg0 = float(out0.aggregated_stress)
print(f"initial: mass {mass0:.3f} kg, aggregated stress {agg0/1e6:.1f} MPa,"
      f" tip disp {float(np.asarray(out0.disp_solid).max()):.4f} m")
for t in sorted(mesh.cell_tags):
    p = float(out0.to_dict()[f"pnorm_stress_{t}"])
    # aggregated = (1/m) * pnorm^(1/rho) with m=1e-6, rho=100
    # (AggregatedStressModel) -> in MPa that is just pnorm^0.01
    print(f"  tag {t}: aggregated stress {p ** 0.01:.1f} MPa")

if run_check_derivatives:
    from femo_alpha_tpu.adjoint import check_totals

    def agg(p):
        return jnp.reshape(ev(p).aggregated_stress, ())

    check_totals(agg, {"thickness": jnp.full(nel, h0)}, eps=1e-7)

prob = OptimizationProblem(ev)
prob.add_design_variable("thickness", h0 * np.ones(nel),
                         lower=h_min, upper=h_max)
prob.add_constraint("aggregated_stress", upper=sigma_y / safety,
                    scaler=safety / sigma_y)
prob.set_objective("mass", scaler=1.0 / mass0)
dvs, res = prob.solve(maxiter=maxiter, ftol=1e-8)

h_opt = np.asarray(dvs["thickness"])
out = ev({"thickness": jnp.asarray(h_opt)})
print(f"optimized: mass {float(out.mass):.3f} kg "
      f"({float(out.mass)/mass0:.3f}x initial), aggregated stress "
      f"{float(out.aggregated_stress)/1e6:.1f} MPa "
      f"(limit {sigma_y/safety/1e6:.1f}), "
      f"h in [{h_opt.min():.4f}, {h_opt.max():.4f}] m")
