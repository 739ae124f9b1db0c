"""Vector-valued constraints in OptimizationProblem (ModOpt/csdl parity:
`set_as_constraint` on vector variables, e.g. per-bay buckling margins)."""

import numpy as np
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.opt import OptimizationProblem


class Out:
    pass


def test_vector_lower_bound_constraint():
    # min sum(x^2) s.t. x >= [1, 2, 3]  ->  x* = [1, 2, 3]
    def ev(dv):
        out = Out()
        out.obj = jnp.sum(dv["x"] ** 2)
        out.con = dv["x"]
        return out

    prob = OptimizationProblem(ev)
    prob.add_design_variable("x", np.array([5.0, 5.0, 5.0]))
    prob.set_objective("obj")
    prob.add_constraint("con", lower=np.array([1.0, 2.0, 3.0]))
    dvs, res = prob.solve(maxiter=100, report=False)
    assert res.success
    np.testing.assert_allclose(np.asarray(dvs["x"]), [1.0, 2.0, 3.0],
                               atol=1e-6)


def test_vector_equality_and_scalar_upper_mix():
    # min sum((x-2)^2) s.t. [x0+x1, x2] == [1, 0.5], x3 <= 0
    def ev(dv):
        x = dv["x"]
        out = Out()
        out.obj = jnp.sum((x - 2.0) ** 2)
        out.eqs = jnp.stack([x[0] + x[1], x[2]])
        out.x3 = x[3]
        return out

    prob = OptimizationProblem(ev)
    prob.add_design_variable("x", np.zeros(4))
    prob.set_objective("obj")
    prob.add_constraint("eqs", equals=np.array([1.0, 0.5]))
    prob.add_constraint("x3", upper=0.0)
    dvs, res = prob.solve(maxiter=200, report=False)
    assert res.success
    x = np.asarray(dvs["x"])
    np.testing.assert_allclose(x[0] + x[1], 1.0, atol=1e-7)
    np.testing.assert_allclose(x[2], 0.5, atol=1e-7)
    assert x[3] <= 1e-9
    # symmetric split of the equality
    np.testing.assert_allclose(x[0], 0.5, atol=1e-6)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
