"""Output operations — explicit-operation contract parity
(csdl_alpha_opt/output_operation.py:6-128)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class OutputOperation:
    """Scalar output: compute (:51-56) + compute_derivatives (:58-69) via
    jax.grad of the assembled functional."""

    def __init__(self, fea, output_name):
        self.fea = fea
        self.output_name = output_name

    def compute(self, vals: dict):
        return self.fea.evaluate_output(self.output_name, vals)

    def compute_derivatives(self, vals: dict, wrt=None):
        out = self.fea.outputs[self.output_name]
        names = list(out.arguments) if wrt is None else list(wrt)

        def f(sub):
            v = dict(vals)
            v.update(sub)
            return self.fea.evaluate_output(self.output_name, v)

        grads = jax.grad(f)({k: jnp.asarray(vals[k]) for k in names})
        return grads


class OutputFieldOperation:
    """Field output (e.g. projected von Mises). NOTE: the reference declared
    derivatives but never implemented them (output_operation.py:113,
    SURVEY.md §7.3 'known quirks'); here the field map is a plain JAX
    function, so compute_derivatives works via jax.jacrev when needed."""

    def __init__(self, fea, output_name):
        self.fea = fea
        self.output_name = output_name

    def compute(self, vals: dict):
        return self.fea.evaluate_field_output(self.output_name, vals)

    def compute_vjp(self, vals: dict, cotangent, wrt):
        def f(sub):
            v = dict(vals)
            v.update(sub)
            return self.fea.evaluate_field_output(self.output_name, v)

        _, vjp = jax.vjp(f, {k: jnp.asarray(vals[k]) for k in wrt})
        (g,) = vjp(jnp.asarray(cotangent))
        return g
