"""Beam thickness optimization — the reference's own smoke test / golden
anchor (SURVEY.md §6, docs/src/getting_started.md:49-68): 50-element Hermite
cantilever, SLSQP thickness optimization must hit the OpenMDAO-published
compliance 23762.1537 and thickness distribution."""

import numpy as np
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.models import EulerBernoulliBeamModel
from femo_alpha_tpu.opt import OptimizationProblem
from femo_alpha_tpu.adjoint import check_totals

GOLDEN_COMPLIANCE = 23762.153677443166  # OpenMDAO reference value

# OpenMDAO-published optimized thickness distribution (public golden data,
# openmdao.org beam optimization example)
THICK_REF = np.array([
    0.14915754, 0.14764328, 0.14611321, 0.14456715, 0.14300421, 0.14142417,
    0.13982611, 0.13820976, 0.13657406, 0.13491866, 0.13324268, 0.13154528,
    0.12982575, 0.12808305, 0.12631658, 0.12452477, 0.12270701, 0.12086183,
    0.11898809, 0.11708424, 0.11514904, 0.11318072, 0.11117762, 0.10913764,
    0.10705891, 0.10493903, 0.10277539, 0.10056526, 0.09830546, 0.09599246,
    0.09362243, 0.09119084, 0.08869265, 0.08612198, 0.08347229, 0.08073573,
    0.07790323, 0.07496382, 0.07190453, 0.06870925, 0.0653583, 0.06182632,
    0.05808044, 0.05407658, 0.04975295, 0.0450185, 0.03972912, 0.03363155,
    0.02620192, 0.01610863,
])


@pytest.fixture(scope="module")
def beam():
    return EulerBernoulliBeamModel(nel=50)


def test_uniform_beam_matches_euler_bernoulli_closed_form(beam):
    out = beam.evaluate(0.1 * np.ones(50))
    EI = 1.0 * 0.1 * 0.1**3 / 12.0
    tip = 1.0 * 1.0**3 / (3 * EI)  # |P| L^3 / (3 EI)
    u = np.asarray(out.displacements)
    assert abs(u[-2] + tip) / tip < 1e-8
    assert abs(float(out.compliance) - tip) / tip < 1e-8
    assert abs(float(out.volume) - 0.01) < 1e-14


def test_forward_eval_at_openmdao_optimum(beam):
    # parity anchor: run_verify_forward_eval in the reference example
    out = beam.evaluate(THICK_REF)
    assert abs(float(out.compliance) - GOLDEN_COMPLIANCE) / GOLDEN_COMPLIANCE < 1e-6


def test_beam_adjoint_vs_fd(beam):
    def compliance(p):
        return jnp.reshape(beam.evaluate(p["thickness"]).compliance, ())

    # eps=1e-5 sits at the bottom of the FD V-curve for this compliance
    # scale (~1e5): 1e-6 is roundoff-dominated (measured rel ~4e-5 from FD
    # noise alone), 1e-4 truncation-dominated
    check_totals(
        compliance, {"thickness": jnp.full(50, 0.1)}, eps=1e-5,
        directions=2, rtol=1e-5, verbose=False,
    )


def test_full_thickness_optimization_hits_golden(beam):
    prob = OptimizationProblem(lambda dvs: beam.evaluate(dvs["thickness"]))
    prob.add_design_variable("thickness", 0.1 * np.ones(50), lower=1e-2,
                             upper=10.0)
    prob.set_objective("compliance")
    prob.add_constraint("volume", equals=0.01)
    dvs, res = prob.solve(maxiter=1000, ftol=1e-9, report=False)
    assert res.success
    assert abs(res.fun - GOLDEN_COMPLIANCE) / GOLDEN_COMPLIANCE < 1e-6
    assert np.abs(np.asarray(dvs["thickness"]) - THICK_REF).max() < 1e-4
