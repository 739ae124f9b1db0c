"""Shell thickness optimization of a cantilever plate — the reference's
ex_simple_shell.py rebuilt on femo_alpha_tpu (reference:
examples/advanced_examples/simple_shell_opt/ex_simple_shell.py; the forward
anchor is the Euler-Bernoulli closed form, :98-102).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))


import numpy as np
import jax.numpy as jnp

from femo_alpha_tpu.mesh import StructuredQuadMesh
from femo_alpha_tpu.models import RMShellModel
from femo_alpha_tpu.opt import OptimizationProblem

run_verify_forward_eval = True
run_check_derivatives = False
run_optimization = True
element_wise_material = True

E_val, nu_val, h_val, rho_val = 4.32e8, 0.0, 0.2, 1.0
width, length = 2.0, 10.0
f_d = 10.0 * h_val

# plate_2_10_quad_4_20 analogue
mesh = StructuredQuadMesh(20, 4, (0, 0), (length, width), gdim=3)
nel, nn = mesh.n_cells, mesh.n_nodes


def ClampedBoundary(x):
    return x[:, 0] < 3e-16


shell_model = RMShellModel(
    mesh, shell_bc_func=ClampedBoundary,
    element_wise_material=element_wise_material, record=False)

pressure = np.zeros((nn, 3))
pressure[:, 2] = f_d
base = dict(
    E=jnp.full(nel, E_val), nu=jnp.full(nel, nu_val),
    density=jnp.full(nel, rho_val))

if run_verify_forward_eval:
    out = shell_model.evaluate(
        jnp.asarray(pressure), thickness=jnp.full(nel, h_val),
        is_pressure=True, **base)
    Ix = width * h_val**3 / 12
    print("Euler-Bernoulli beam theory deflection:",
          f_d * width * length**4 / (8 * E_val * Ix) / width)
    print("Reissner-Mindlin FE deflection:",
          float(np.asarray(out.disp_solid).max()))
    print("mass:", float(out.mass), " aggregated stress:",
          float(out.aggregated_stress))

if run_check_derivatives:
    from femo_alpha_tpu.adjoint import check_totals

    def agg(p):
        out = shell_model.evaluate(
            jnp.asarray(pressure), thickness=p["thickness"],
            is_pressure=True, **base)
        return jnp.reshape(out.aggregated_stress, ())

    check_totals(agg, {"thickness": jnp.full(nel, h_val)}, eps=1e-6)

if run_optimization:
    def ev(dv):
        return shell_model.evaluate(
            jnp.asarray(pressure), thickness=dv["thickness"],
            is_pressure=True, **base)

    prob = OptimizationProblem(ev)
    prob.add_design_variable("thickness", h_val * np.ones(nel), lower=1e-2,
                             upper=10.0)
    mass_0 = rho_val * h_val * width * length
    prob.add_constraint("mass", equals=mass_0)
    prob.set_objective("compliance")
    dvs, res = prob.solve(maxiter=200, ftol=1e-9)
    print("optimized compliance:", res.fun, " iterations:", res.nit)
