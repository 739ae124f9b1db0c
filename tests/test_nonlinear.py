"""VERDICT round-1 item 9: a genuinely nonlinear problem exercised through
both Newton surfaces — `solvers.newton_solve` (convergence-controlled;
reference solveNonlinear/SNES, utils_dolfinx.py:338-468) and
`ImplicitPDE(newton_iters>1)` (fixed-trip, differentiable), with an
FD-checked adjoint at the converged state."""

import numpy as np
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.adjoint.check import check_totals
from femo_alpha_tpu.mesh import createUnitSquareMesh
from femo_alpha_tpu.models import NonlinearPoissonModel


@pytest.fixture(scope="module")
def nlp():
    mesh = createUnitSquareMesh(12, 12, cell_type="triangle")
    return NonlinearPoissonModel(mesh, newton_iters=8)


def _params(nlp, scale=40.0):
    rng = np.random.default_rng(3)
    kappa = jnp.asarray(1.0 + 0.5 * rng.random(nlp.K.n_dofs))
    x = np.asarray(nlp.V.dof_coords)
    f = jnp.asarray(scale * np.sin(np.pi * x[:, 0]) * x[:, 1])
    return kappa, f


def test_newton_solve_converges(nlp):
    kappa, f = _params(nlp)
    u, info = nlp.solve_checked(kappa, f)
    assert info["converged"]
    # quadratic convergence: a handful of iterations, not max_it
    assert 2 <= info["iters"] <= 8, info
    assert info["resnorm"] <= 1e-11
    # the problem is genuinely nonlinear at this load: the linear (1-Newton)
    # answer differs measurably
    pde = nlp.fea.states["u"].pde
    r0 = pde.residual(jnp.zeros(pde.n_dofs), {"kappa": kappa, "f": f})
    u_lin = -pde.make_solver(jnp.zeros(pde.n_dofs),
                             {"kappa": kappa, "f": f}).solve(r0)
    rel = float(jnp.linalg.norm(u - u_lin) / jnp.linalg.norm(u))
    assert rel > 1e-3, rel


def test_newton_raises_on_nonconvergence(nlp):
    kappa, f = _params(nlp)
    with pytest.raises(RuntimeError, match="Newton failed"):
        nlp.solve_checked(kappa, f, atol=1e-30, rtol=1e-30, max_it=2)


def test_fixed_trip_matches_checked_newton(nlp):
    kappa, f = _params(nlp)
    u_checked, info = nlp.solve_checked(kappa, f)
    out = nlp.evaluate(kappa, f)
    rel = float(jnp.linalg.norm(out.u - u_checked)
                / jnp.linalg.norm(u_checked))
    assert rel < 1e-10, rel
    # converged residual through the differentiable path too
    pde = nlp.fea.states["u"].pde
    rn = float(jnp.linalg.norm(pde.residual(out.u, {"kappa": kappa,
                                                    "f": f})))
    assert rn <= 1e-10, rn


def test_nonlinear_adjoint_vs_fd(nlp):
    kappa, f = _params(nlp)

    def J(p):
        return jnp.reshape(nlp.evaluate(p["kappa"], f).compliance, ())

    check_totals(J, {"kappa": kappa}, eps=1e-6, directions=2, rtol=1e-6,
                 verbose=False)


def test_nonlinear_adjoint_wrt_load_vs_fd(nlp):
    kappa, f = _params(nlp)

    def J(p):
        return jnp.reshape(nlp.evaluate(kappa, p["f"]).compliance, ())

    check_totals(J, {"f": f}, eps=1e-6, directions=2, rtol=1e-6,
                 verbose=False)
