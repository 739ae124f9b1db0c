"""Transient shell thickness optimization (step-load plate) — the
reference's ex_simple_dynamic_shell_opt.py rebuilt on femo_alpha_tpu
(reference: examples/advanced_examples/simple_dynamic_shell_opt/...).

Minimizes total strain energy over the time history subject to a volume
constraint; the transient adjoint comes from JAX AD through the lax.scan
time stepper (replacing state_operation_dynamic.py's hand-written sweep).
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

run_check_derivatives = False
run_optimization = True

E, nu, rho, h = 4.32e8, 0.0, 10.0, 0.2
dt, Nsteps = 0.01, 20

mesh = StructuredQuadMesh(10, 2, (0, 0), (10, 2), gdim=3)
sim = PlateSim(mesh, E, nu, rho, dt, Nsteps, element_wise_thickness=True,
               quad_deg=4)
nn, nel = mesh.n_nodes, mesh.n_cells

f = np.zeros((nn, 3))
f[:, 2] = 2.0
sim.update_f_history(np.tile(f.reshape(1, -1), (Nsteps + 1, 1)))
sim.update_t(np.full(nel, h))

state_op = StateOperation(sim)
tse_op = TotalStrainEnergyOperation(sim)
vol_op = VolumeOperation(sim)

w_hist = state_op.evaluate(sim.t_array)
print("total strain energy @ uniform:",
      float(tse_op.evaluate(w_hist, sim.t_array)))
print("volume:", float(vol_op.evaluate(sim.t_array)))

if run_check_derivatives:
    from femo_alpha_tpu.adjoint import check_totals

    def obj(p):
        wh = state_op.evaluate(p["thickness"])
        return jnp.reshape(tse_op.evaluate(wh, p["thickness"]), ())

    check_totals(obj, {"thickness": sim.t_array}, eps=1e-5)

if run_optimization:
    def ev(dv):
        wh = state_op.evaluate(dv["thickness"])
        return {
            "total_strain_energy": tse_op.evaluate(wh, dv["thickness"]),
            "volume": vol_op.evaluate(dv["thickness"]),
        }

    prob = OptimizationProblem(ev)
    prob.add_design_variable("thickness", h * np.ones(nel), lower=1e-2,
                             upper=10.0)
    prob.add_constraint("volume", equals=h * 2 * 10)
    prob.set_objective("total_strain_energy")
    dvs, res = prob.solve(maxiter=50, ftol=1e-8)
    print("optimized total strain energy:", res.fun, " nit:", res.nit)
