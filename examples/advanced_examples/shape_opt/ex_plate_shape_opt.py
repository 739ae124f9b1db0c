"""Shape optimization of a cantilever plate planform: node_disp (the mesh
motion field uhat) as the SLSQP design variable, exactly the reference's
shape-derivative mechanism — geometry changes enter the PDE through the
J(uhat)/F(uhat) deformed-configuration pullbacks instead of remeshing
(reference: rm_shell/linear_shell_fenicsx/kinematics.py:12-44; node_disp
produced by FFD in
examples/advanced_examples/pav_shell_opt/ex_pav_shell_w_caddee.py:353-396).

A transversely loaded cantilever is free to move its planform (in-plane y
node motion, root clamped): widening where the bending moment is largest
stiffens the structure, so compliance drops. Note that for a FLAT plate a
pure out-of-plane (z) node motion changes the surface metric only at
second order (det F = 1 for F = I + e_z grad(dz)^T), so the in-plane
moves are the non-degenerate shape directions — same as the reference's
planform/FFD design variables.

Run:  python ex_plate_shape_opt.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

from femo_alpha_tpu.mesh import createRectangleMesh
from femo_alpha_tpu.models import RMShellModel
from femo_alpha_tpu.opt import OptimizationProblem

run_check_derivatives = True
run_optimization = True

NX, NY = 32, 8
L, W = 10.0, 2.0
E_val, nu_val, rho_val, h_val = 4.32e8, 0.0, 100.0, 0.2
SHAPE_BOUND = 0.2  # +-y authority per node (row spacing W/NY keeps cells valid)

mesh = createRectangleMesh(NX, NY, (0, 0), (L, W), "quad", gdim=3)
model = RMShellModel(mesh, shell_bc_func=lambda x: x[:, 0] < 1e-12,
                     element_wise_material=True, PENALTY_BC=False)
nel, nn = model.nel, model.nn

E = jnp.full(nel, E_val)
nu = jnp.full(nel, nu_val)
rho = jnp.full(nel, rho_val)
th = jnp.full(nel, h_val)
force = jnp.zeros(3 * nn).at[2::3].set(2.0)


def evaluate(dvs):
    dy = dvs["dy"]
    node_disp = jnp.zeros((nn, 3)).at[:, 1].set(dy)
    return model.evaluate(force, th, E, nu, rho, node_disp=node_disp,
                          is_pressure=True)


J0 = float(evaluate({"dy": jnp.zeros(nn)}).compliance)
print(f"baseline compliance: {J0:.8e}")

if run_check_derivatives:
    rng = np.random.default_rng(0)
    dy0 = jnp.asarray(0.02 * rng.standard_normal(nn))

    def Jfn(dy):
        return jnp.reshape(evaluate({"dy": dy}).compliance, ())

    g = jax.grad(Jfn)(dy0)
    d = rng.standard_normal(nn)
    d /= np.linalg.norm(d)
    d = jnp.asarray(d)

    def fd(eps):
        return (float(Jfn(dy0 + eps * d)) -
                float(Jfn(dy0 - eps * d))) / (2 * eps)

    fdR = (4.0 * fd(1e-3) - fd(2e-3)) / 3.0
    ad = float(jnp.vdot(g, d))
    rel = abs(ad - fdR) / max(abs(fdR), 1e-300)
    print(f"shape derivative check: adjoint {ad:.8e}  FD {fdR:.8e}  "
          f"rel err {rel:.2e}")
    assert rel < 1e-5

if run_optimization:
    root = np.asarray(mesh.coords[:, 0]) < 1e-12
    lo = np.where(root, 0.0, -SHAPE_BOUND)
    up = np.where(root, 0.0, SHAPE_BOUND)
    prob = OptimizationProblem(evaluate)
    prob.add_design_variable("dy", np.zeros(nn), lower=lo, upper=up)
    prob.set_objective("compliance", scaler=1.0 / J0)
    dvs, res = prob.solve(maxiter=80, ftol=1e-12)

    J1 = float(evaluate({"dy": jnp.asarray(dvs["dy"])}).compliance)
    print(f"optimized compliance: {J1:.8e}  ({100 * (1 - J1 / J0):.2f}% "
          f"reduction, {res.nit} SLSQP iterations)")
    dy = np.asarray(dvs["dy"])
    print("max |dy| =", float(np.max(np.abs(dy))))
