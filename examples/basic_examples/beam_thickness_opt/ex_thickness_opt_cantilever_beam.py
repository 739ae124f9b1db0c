"""1D cantilever beam thickness optimization (Euler-Bernoulli, Hermite
cubic) — the reference's getting-started example rebuilt on femo_alpha_tpu
(reference: examples/basic_examples/beam_thickness_opt/..., golden values
from docs/src/getting_started.md:49-68 / the OpenMDAO beam example).

Run: python ex_thickness_opt_cantilever_beam.py
Expected: optimized compliance ~= 23762.1537 in a few seconds.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))


import numpy as np

from femo_alpha_tpu.models import EulerBernoulliBeamModel
from femo_alpha_tpu.opt import OptimizationProblem

run_verify_forward_eval = True
run_check_derivatives = True
run_optimization = True

E, L, b, h = 1.0, 1.0, 0.1, 0.1
volume = 0.01
nel = 50

beam = EulerBernoulliBeamModel(nel=nel, L=L, E=E, width=b, tip_load=-1.0)

if run_verify_forward_eval:
    out = beam.evaluate(h * np.ones(nel))
    print("compliance @ uniform:", float(out.compliance))
    print("volume:", float(out.volume))

if run_check_derivatives:
    import jax.numpy as jnp

    from femo_alpha_tpu.adjoint import check_totals

    check_totals(
        lambda p: jnp.reshape(beam.evaluate(p["thickness"]).compliance, ()),
        {"thickness": jnp.full(nel, h)}, eps=1e-7, directions=3,
    )

if run_optimization:
    prob = OptimizationProblem(lambda dv: beam.evaluate(dv["thickness"]))
    prob.add_design_variable("thickness", h * np.ones(nel), lower=1e-2,
                             upper=10.0)
    prob.set_objective("compliance")
    prob.add_constraint("volume", equals=volume)
    dvs, res = prob.solve(maxiter=1000, ftol=1e-9)
    print("optimized compliance:", res.fun)
    print("OpenMDAO reference:   23762.153677443166")
    print("optimized thickness (first 10):",
          np.asarray(dvs["thickness"])[:10])
