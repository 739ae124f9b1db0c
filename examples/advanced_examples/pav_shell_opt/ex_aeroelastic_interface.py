"""Aeroelastic one-way coupling interface demo — the contract of the
reference's CADDEE/VLM examples (ex_pav_shell_w_caddee.py, SURVEY.md §3.5)
without the external aero stack:

  aero side -> nodal pressure field (caller node ordering)
  geometry side -> nodal mesh displacement (FFD/shape variables) = node_disp
  shell side <- RMShellModel.evaluate(..., node_disp=...): shape derivatives
  flow through the uhat pullbacks (J/F/gradx) — no remeshing
  shell side -> disp_extracted (n_nodes, 3) back to the aero/OML fit

Demonstrates: gradient of aggregated stress w.r.t. BOTH thickness and the
shape variables driving node_disp, through one evaluate call.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

from femo_alpha_tpu.mesh import StructuredQuadMesh
from femo_alpha_tpu.models import RMShellModel

# wing-box stand-in plate
span, chord = 3.0, 1.0
mesh = StructuredQuadMesh(24, 4, (0, 0), (span, chord), gdim=3)
nn, nel = mesh.n_nodes, mesh.n_cells

model = RMShellModel(mesh, shell_bc_func=lambda x: x[:, 0] < 1e-12,
                     element_wise_material=True, record=False)

# "VLM" pressures: elliptic spanwise distribution
y = mesh.coords[:, 0] / span
cp = np.sqrt(np.clip(1 - y**2, 0, 1))
pressure = np.zeros((nn, 3))
pressure[:, 2] = 100.0 * cp

base = dict(
    E=jnp.full(nel, 69e9), nu=jnp.full(nel, 0.33),
    density=jnp.full(nel, 2700.0))


def shape_to_node_disp(stretch):
    """A toy FFD: spanwise stretch (planform change). Note the uhat
    mechanism (gradx/J pullbacks, identical algebra to the reference's
    kinematics.py) responds to IN-PLANE mesh motion at first order;
    out-of-plane offsets of the reference surface are second-order
    (det(I + e_z X grad w) = 1)."""
    eta = jnp.asarray(mesh.coords[:, 0] / span)
    return jnp.stack(
        [stretch * span * eta, jnp.zeros(nn), jnp.zeros(nn)], axis=1)


def aggregated_stress(dvs):
    node_disp = shape_to_node_disp(dvs["stretch"])
    out = model.evaluate(
        jnp.asarray(pressure), thickness=dvs["thickness"],
        node_disp=node_disp, is_pressure=True, **base)
    return jnp.reshape(out.aggregated_stress, ())


# thickness sized so m*sigma_vM ~ O(1) (the aggregation constant
# m=1e-6 expects stresses ~1e6 Pa, as in the reference wing cases)
dvs = {"thickness": jnp.full(nel, 0.02), "stretch": jnp.asarray(0.1)}
val, grads = jax.value_and_grad(aggregated_stress)(dvs)
print("aggregated stress:", float(val))
print("d(stress)/d(stretch):", float(grads["stretch"]))
print("|d(stress)/d(thickness)|:",
      float(jnp.linalg.norm(grads["thickness"])))

out = model.evaluate(
    jnp.asarray(pressure), thickness=dvs["thickness"],
    node_disp=shape_to_node_disp(dvs["stretch"]), is_pressure=True, **base)
print("disp_extracted shape (back to the OML fit):",
      np.asarray(out.disp_extracted).shape)
