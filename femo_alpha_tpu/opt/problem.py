"""Gradient-based optimization driver.

Replaces the reference's ModOpt + CSDLAlphaProblem + PySimulator pipeline
(SURVEY.md layer 4; ex_thickness_opt_cantilever_beam.py:216-231) with a
scipy SLSQP loop whose objective/constraint gradients are exact adjoints
from jax.grad through the FEAModel evaluate (every gradient evaluation is
one forward solve + one transposed solve, as in the reference's
apply_inverse_jacobian 'rev' path).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import minimize

from ..utils.logging import log


class OptimizationProblem:
    """evaluate: dict(design arrays) -> dict-like with scalar outputs."""

    def __init__(self, evaluate, jit=True, precompute=()):
        """precompute: callables(dvs_dict) run EAGERLY on the caller thread
        at each new design point, BEFORE the jitted objective/constraint
        programs execute. This is how host-solved quantities join a jitted
        pipeline safely: e.g. RMShellModel.modal_eigenvalues memoizes its
        eigensolve per design point, so an eager warm call here means the
        pure_callback inside the jitted program is a pure cache lookup (no
        nested jax work on the XLA runtime thread — the few-core deadlock
        documented in models/rm_shell/model.py is structurally avoided)."""
        self._evaluate = evaluate
        self.jit = jit
        self.precompute = list(precompute)
        self._last_precompute_x = None
        self.dvs: dict[str, dict] = {}
        self.objective = None
        self.obj_scaler = 1.0
        self.constraints: list[dict] = []
        self.result = None

    def _run_precompute(self, x):
        if not self.precompute:
            return
        key = np.asarray(x).tobytes()
        if key == self._last_precompute_x:
            return
        self._last_precompute_x = key
        dvs = self._unpack(np.asarray(x))
        for fn in self.precompute:
            fn(dvs)

    def add_design_variable(self, name, init, lower=None, upper=None):
        """lower/upper: scalar or array broadcastable to init's shape (array
        bounds pin individual entries — e.g. shape variables clamped to zero
        at root nodes, the reference's FFD-frozen geometry dofs)."""
        init = np.atleast_1d(np.asarray(init, dtype=np.float64))
        self.dvs[name] = dict(init=init, lower=lower, upper=upper,
                              size=init.size, shape=init.shape)

    def set_objective(self, name, scaler=1.0):
        self.objective = name
        self.obj_scaler = scaler

    def add_constraint(self, name, lower=None, upper=None, equals=None,
                       scaler=1.0):
        """scaler: multiplies the constraint value and its bounds before
        they reach SLSQP (the reference's ModOpt `scaler=` knob) — without
        it, O(1e8) stress constraints against an O(1) objective wreck the
        QP subproblem conditioning."""
        self.constraints.append(
            dict(name=name, lower=lower, upper=upper, equals=equals,
                 scaler=scaler)
        )

    # ------------------------------------------------------------ plumbing
    def _pack(self, dv_dict):
        return np.concatenate(
            [np.asarray(dv_dict[k]).ravel() for k in self.dvs]
        )

    def _unpack(self, x):
        out, o = {}, 0
        for k, spec in self.dvs.items():
            out[k] = jnp.asarray(x[o: o + spec["size"]]).reshape(spec["shape"])
            o += spec["size"]
        return out

    def _output(self, outs, name):
        if hasattr(outs, "to_dict"):
            outs = outs.to_dict()
        if isinstance(outs, dict):
            return outs[name]
        return getattr(outs, name)

    def _scalar_fn(self, name, scaler=1.0):
        def f(x_jnp):
            dvs = self._unpack(x_jnp)
            outs = self._evaluate(dvs)
            return jnp.reshape(self._output(outs, name), ()) * scaler

        vg = jax.value_and_grad(f)
        if self.jit:
            vg = jax.jit(vg)
        return vg

    def _vector_fn(self, name, scaler=1.0):
        """Value + Jacobian of a (possibly vector-valued) constraint output
        — ModOpt/csdl `set_as_constraint` accepts vector variables (e.g.
        per-bay margins); jacrev = one adjoint sweep per component."""
        def f(x_jnp):
            dvs = self._unpack(x_jnp)
            outs = self._evaluate(dvs)
            return jnp.ravel(jnp.asarray(self._output(outs, name))) * scaler

        vj = jax.jit(lambda x: (f(x), jax.jacrev(f)(x))) if self.jit \
            else (lambda x: (f(x), jax.jacrev(f)(x)))
        return vj

    # ------------------------------------------------------------- solve
    def solve(self, maxiter=1000, ftol=1e-9, callback=None, report=True):
        assert self.objective is not None, "set_objective first"
        x0 = self._pack({k: v["init"] for k, v in self.dvs.items()})

        obj_vg = self._scalar_fn(self.objective, self.obj_scaler)

        def obj(x):
            self._run_precompute(x)
            v, g = obj_vg(jnp.asarray(x))
            return float(v), np.asarray(g, dtype=np.float64)

        cons = []
        for c in self.constraints:
            vg = self._vector_fn(c["name"], c.get("scaler", 1.0))
            sc = c.get("scaler", 1.0)

            def make(vg, shift, sign):
                # scipy SLSQP accepts vector-valued constraint functions:
                # fun -> (m,), jac -> (m, n); scalars are m=1
                def fun(x):
                    self._run_precompute(x)
                    v, _ = vg(jnp.asarray(x))
                    return sign * (np.asarray(v, dtype=np.float64) - shift)

                def jac(x):
                    self._run_precompute(x)
                    _, J = vg(jnp.asarray(x))
                    return sign * np.asarray(J, dtype=np.float64)

                return fun, jac

            if c["equals"] is not None:
                fun, jac = make(vg, sc * np.asarray(c["equals"],
                                                    dtype=np.float64), 1.0)
                cons.append(dict(type="eq", fun=fun, jac=jac))
            else:
                if c["lower"] is not None:
                    fun, jac = make(vg, sc * np.asarray(c["lower"],
                                                        dtype=np.float64),
                                    1.0)
                    cons.append(dict(type="ineq", fun=fun, jac=jac))
                if c["upper"] is not None:
                    fun, jac = make(vg, sc * np.asarray(c["upper"],
                                                        dtype=np.float64),
                                    -1.0)
                    cons.append(dict(type="ineq", fun=fun, jac=jac))

        bounds = None
        lo_up = []
        for k, spec in self.dvs.items():
            lo = spec["lower"]
            up = spec["upper"]
            if lo is None and up is None:
                lo_up += [(None, None)] * spec["size"]
                continue

            def _arr(v):
                if v is None:
                    return [None] * spec["size"]
                a = np.broadcast_to(np.asarray(v, dtype=np.float64),
                                    spec["shape"]).ravel()
                return list(a)

            lo_up += list(zip(_arr(lo), _arr(up)))
        if any(l is not None or u is not None for l, u in lo_up):
            bounds = lo_up

        res = minimize(
            obj,
            x0,
            jac=True,
            method="SLSQP",
            bounds=bounds,
            constraints=cons,
            options={"maxiter": maxiter, "ftol": ftol},
            callback=callback,
        )
        self.result = res
        if report:
            log(
                f"SLSQP: {res.message} | f*={res.fun:.10g} | nit={res.nit} "
                f"| nfev={res.nfev} | njev={res.njev}"
            )
        return self._unpack(res.x), res


class SLSQP:
    """Thin name-parity shim for the reference's `SLSQP(prob, ...)` driver
    (modopt; ex_thickness_opt_cantilever_beam.py:216-231)."""

    def __init__(self, problem: OptimizationProblem, solver_options=None):
        self.problem = problem
        self.options = dict(solver_options or {})

    def solve(self):
        maxiter = self.options.get("maxiter", 1000)
        ftol = self.options.get("ftol", 1e-9)
        return self.problem.solve(maxiter=maxiter, ftol=ftol)

    def print_results(self):
        res = self.problem.result
        if res is not None:
            log(
                f"objective={res.fun:.12g} iterations={res.nit} "
                f"success={res.success}"
            )
