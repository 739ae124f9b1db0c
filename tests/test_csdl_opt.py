"""csdl-operation-contract layer: the four methods must reproduce the same
totals as end-to-end AD (the reference's StateOperation semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from femo_alpha_tpu.mesh import createUnitSquareMesh
from femo_alpha_tpu.models import PoissonModel
from femo_alpha_tpu.csdl_opt import StateOperation, OutputOperation


def test_state_operation_contract_matches_ad():
    mesh = createUnitSquareMesh(6, 6, "triangle")
    m = PoissonModel(mesh)
    x = m.V.dof_coords
    f = jnp.asarray(np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1]))
    kappa = jnp.ones(m.K.n_dofs) * 1.2
    inputs = {"kappa": kappa, "f": f}

    op = StateOperation(m.fea, "u")
    u = op.solve_residual_equations(inputs)

    # manual adjoint via the contract: dJ/dkappa for J = sum(u^2)
    g_u = 2 * u
    lam = op.apply_inverse_jacobian(g_u, mode="rev")
    d_in = op.compute_jacvec_product(inputs, "rev", lam)
    manual = -np.asarray(d_in["kappa"])

    # reference: end-to-end jax.grad
    def J(kappa):
        out = m.evaluate(kappa, f)
        return jnp.sum(out.u**2)

    auto = np.asarray(jax.grad(J)(kappa))
    assert np.allclose(manual, auto, rtol=1e-8, atol=1e-12)

    # fwd-mode consistency: directional derivative both ways
    rng = np.random.default_rng(0)
    dk = jnp.asarray(rng.standard_normal(kappa.shape))
    dr = op.compute_jacvec_product(inputs, "fwd",
                                   {"kappa": dk, "f": jnp.zeros_like(f)})
    du = -op.apply_inverse_jacobian(dr, mode="fwd")
    fwd_dirderiv = float(jnp.vdot(g_u, du))
    rev_dirderiv = float(jnp.vdot(jnp.asarray(auto), dk))
    assert abs(fwd_dirderiv - rev_dirderiv) < 1e-8 * max(
        1.0, abs(rev_dirderiv))


def test_output_operation_contract():
    mesh = createUnitSquareMesh(5, 5, "triangle")
    m = PoissonModel(mesh)
    x = m.V.dof_coords
    f = jnp.asarray(np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1]))
    out = m.evaluate(jnp.ones(m.K.n_dofs), f)
    op = OutputOperation(m.fea, "compliance")
    vals = {"u": out.u, "f": f, "kappa": jnp.ones(m.K.n_dofs)}
    c = op.compute(vals)
    assert abs(float(c) - float(out.compliance)) < 1e-14
    g = op.compute_derivatives(vals, wrt=["f"])
    # compliance = f.u -> d/df = u (+ zero through solve since u fixed here)
    assert np.allclose(np.asarray(g["f"]), np.asarray(out.u), atol=1e-12)
