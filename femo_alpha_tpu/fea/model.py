"""FEAModel: run all states + outputs of one or more FEA problems as a single
differentiable function — parity with the reference's CSDL graph façade
(csdl_alpha_opt/fea_model.py:6-65), with JAX tracing replacing the csdl
recorder graph.

`evaluate(inputs) -> VariableGroup` mirrors FEAModel.evaluate: every state
spawns an implicit solve (the StateOperation analogue), every output an
explicit functional evaluation (OutputOperation analogue). The returned
group holds device arrays; wrap `evaluate` in jax.grad / jax.jit freely.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax.numpy as jnp


class VariableGroup(SimpleNamespace):
    """csdl.VariableGroup stand-in: attribute bag of arrays."""

    def to_dict(self):
        return dict(self.__dict__)


class FEAModel:
    def __init__(self, fea, warm_start=True):
        """fea: list of FEA problems (evaluated in order, states chained).

        warm_start: reuse the previous solution as the Newton initial guess
        across evaluate() calls (the reference does this implicitly because
        dolfinx Functions persist across optimizer iterations, SURVEY.md §5).
        Warm starts are applied only outside of JAX tracing."""
        self.fea_list = fea if isinstance(fea, (list, tuple)) else [fea]
        self.warm_start = warm_start
        self._last_states: dict = {}

    def evaluate(self, inputs) -> VariableGroup:
        """inputs: dict or VariableGroup of input arrays keyed by input name.
        Returns VariableGroup with inputs, states, outputs, field outputs."""
        vals = dict(inputs.to_dict() if hasattr(inputs, "to_dict") else inputs)
        for fea in self.fea_list:
            for sname, st in fea.states.items():
                params = {k: vals[k] for k in st.arguments}
                u0 = None
                prev = self._last_states.get(sname)
                if self.warm_start and prev is not None:
                    u0 = prev
                u = fea.solve(sname, params, u0=u0)
                vals[sname] = u
                if not _is_tracing(u):
                    self._last_states[sname] = u
            for oname in fea.outputs:
                vals[oname] = fea.evaluate_output(oname, vals)
            for fname in fea.field_outputs:
                vals[fname] = fea.evaluate_field_output(fname, vals)
        return VariableGroup(**vals)


def _is_tracing(x):
    import jax.core

    return isinstance(x, jax.core.Tracer)
