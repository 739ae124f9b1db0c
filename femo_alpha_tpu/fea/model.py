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
    """csdl.VariableGroup stand-in: attribute bag of arrays.

    Entries may be LAZY (computed on first attribute access and cached) —
    see `add_lazy`. On the TPU hostloop execution path every output
    functional is its own remote-compiled program at ~30-150 s each
    (fea/pipeline.py), so computing all ~8 shell outputs eagerly when a
    pipeline reads two of them multiplies compile time for nothing; inside
    a fused jit the same economy comes from XLA dead-code elimination, so
    laziness is only installed for concrete (non-traced) evaluations."""

    def add_lazy(self, name, thunk):
        self.__dict__.setdefault("_lazy", {})[name] = thunk

    def __getattr__(self, name):
        lazy = self.__dict__.get("_lazy")
        if lazy and name in lazy:
            val = lazy.pop(name)()
            setattr(self, name, val)
            return val
        raise AttributeError(name)

    def to_dict(self):
        """Forces any still-lazy entries (callers expect real arrays)."""
        for name in list(self.__dict__.get("_lazy", {})):
            getattr(self, name)
        return {k: v for k, v in self.__dict__.items() if k != "_lazy"}


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
        # Laziness is installed unless we are inside an ABSTRACT trace
        # (jit/eval_shape: DynamicJaxprTracers — laziness there would leak
        # tracers, and eager compute is free since jit dead-code-eliminates
        # unconsumed outputs). Under an eager jax.grad the tracers carry
        # concrete primals and every op EXECUTES on device, so laziness is
        # exactly the economy: only outputs the objective reads are ever
        # computed/compiled. Caveat (documented): accessing a still-lazy
        # output AFTER an eager grad trace has closed raises jax's
        # UnexpectedTracerError — read outputs inside the traced function.
        abstract = not all(_has_concrete_data(v) for v in vals.values())
        out = VariableGroup()
        for fea in self.fea_list:
            for sname, st in fea.states.items():
                params = {k: vals[k] for k in st.arguments}
                u0 = None
                prev = self._last_states.get(sname)
                if self.warm_start and prev is not None:
                    u0 = prev
                u = fea.solve(sname, params, u0=u0)
                vals[sname] = u
                abstract = abstract or not _has_concrete_data(u)
                uc = _concrete_value(u)
                if uc is not None:
                    # under an eager jax.grad, u is a JVP tracer whose
                    # primal chain bottoms out in the actual solution —
                    # store THAT (storing nothing meant warm starts never
                    # engaged during gradient evaluation, i.e. on every
                    # optimizer iteration: each solve restarted from
                    # rel=1.0 instead of ~the design-step size)
                    self._last_states[sname] = uc
            for oname in fea.outputs:
                if abstract:
                    vals[oname] = fea.evaluate_output(oname, vals)
                else:
                    out.add_lazy(
                        oname,
                        lambda fea=fea, oname=oname, vals=vals:
                        fea.evaluate_output(oname, vals))
            for fname in fea.field_outputs:
                if abstract:
                    vals[fname] = fea.evaluate_field_output(fname, vals)
                else:
                    out.add_lazy(
                        fname,
                        lambda fea=fea, fname=fname, vals=vals:
                        fea.evaluate_field_output(fname, vals))
        for k, v in vals.items():
            setattr(out, k, v)
        return out


def _is_tracing(x):
    import jax.core

    return isinstance(x, jax.core.Tracer)


def _concrete_value(x):
    """The concrete array at the bottom of a JVP-tracer primal chain (the
    actual computed value under an eager jax.grad), the array itself when
    already concrete, or None under an abstract trace."""
    import jax.core

    while isinstance(x, jax.core.Tracer):
        x = getattr(x, "primal", None)
        if x is None:
            return None
    return x


def _has_concrete_data(x):
    """True for plain arrays AND for tracers whose primal chain bottoms out
    in a real array (eager jax.grad/vjp JVP tracers): ops on those execute
    on device immediately, so lazy outputs still save real compute. False
    for abstract tracers (jit / eval_shape)."""
    import jax.core

    while isinstance(x, jax.core.Tracer):
        p = getattr(x, "primal", None)
        if p is None:
            return False
        x = p
    return True
