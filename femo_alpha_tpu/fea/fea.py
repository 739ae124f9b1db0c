"""FEA: problem registry + solve façade — API parity with the reference's
`FEA` class (fea_dolfinx.py:22-222: add_input/add_state/add_output/
add_field_output/add_strong_bc/solve), rebuilt on the JAX core.

Key difference from the reference: derivative forms are never registered.
`ufl.derivative`-generated dR/du and per-argument dR/df forms
(fea_dolfinx.py:81-82, :104-110) are replaced by jax.jacfwd/jax.vjp through
the assembled residual inside ImplicitPDE.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from ..adjoint.implicit import ImplicitPDE
from ..assembly.assemble import FemForm, assemble_scalar
from ..assembly.bc import DirichletBC, combine_bcs
from ..config import fdtype


@dataclass
class _Input:
    space: object
    init_val: object = None
    record: bool = False


@dataclass
class _State:
    form: FemForm
    arguments: list
    extra_residual: Optional[Callable] = None
    newton_iters: int = 1
    solver_opts: dict = field(default_factory=dict)
    facet_forms: tuple = ()
    element_matrices_fn: Optional[Callable] = None
    pde: Optional[ImplicitPDE] = None


@dataclass
class _Output:
    fn: Callable  # fn(vals: dict) -> scalar  OR an energy FemForm
    arguments: list
    form: Optional[FemForm] = None


class FEA:
    """Registry of inputs / states / outputs over one mesh.

    Attributes mirroring the reference config surface (fea_dolfinx.py:37-48):
    PDE_SOLVER ('Newton'|'SNES' — both map to the same Newton core here),
    REPORT, record, linear_problem.
    """

    def __init__(self, mesh):
        self.mesh = mesh
        self.inputs: dict[str, _Input] = {}
        self.states: dict[str, _State] = {}
        self.outputs: dict[str, _Output] = {}
        self.field_outputs: dict[str, _Output] = {}
        self.bcs: list[DirichletBC] = []
        # config parity
        self.PDE_SOLVER = "Newton"
        self.REPORT = False
        self.record = False
        self.linear_problem = True
        self.custom_solve = None  # hook parity (fea_dolfinx.py:41-44,166-170)
        self.opt_iter = 0
        self.recorder = None

    # ------------------------------------------------------------ registry
    def add_input(self, name, space, init_val=None, record=False):
        self.inputs[name] = _Input(space, init_val, record)

    def add_state(
        self,
        name,
        residual_form: FemForm,
        arguments,
        extra_residual=None,
        newton_iters=None,
        solver_opts=None,
        facet_forms=(),
        element_matrices_fn=None,
    ):
        """residual_form: FemForm (kind='residual' or 'energy') over the
        state space; arguments: input names the residual reads (parity with
        fea_dolfinx.py:71-95 — here only used for bookkeeping; JAX tracks
        actual dataflow)."""
        ni = newton_iters if newton_iters is not None else (
            1 if self.linear_problem else 3
        )
        self.states[name] = _State(
            residual_form,
            list(arguments),
            extra_residual,
            ni,
            dict(solver_opts or {}),
            tuple(facet_forms),
            element_matrices_fn,
        )
        self._build_pde(name)

    def add_output(self, name, form=None, arguments=(), fn=None):
        """Scalar output: either an energy-kind FemForm whose first argument
        is the field it integrates (state or input), or fn(vals)->scalar."""
        assert (form is None) != (fn is None)
        self.outputs[name] = _Output(fn, list(arguments), form)

    def add_field_output(self, name, fn, arguments=(), record=False):
        """Field output: fn(vals)->array (e.g. an L2 projection;
        parity with add_field_output fea_dolfinx.py:118-136)."""
        self.field_outputs[name] = _Output(fn, list(arguments))

    def add_strong_bc(self, dofs, values=0.0):
        """Parity with add_strong_bc (fea_dolfinx.py:147-157)."""
        self.bcs.append(DirichletBC(dofs, values))
        # rebuild eagerly: PDE objects must never be constructed inside a JAX
        # trace (their BC masks would leak as tracers into later traces)
        for name in self.states:
            self._build_pde(name)

    # ------------------------------------------------------------ solving
    def _build_pde(self, name):
        st = self.states[name]
        free, bcv = combine_bcs(st.form.space.n_dofs, self.bcs)
        opts = {"method": "cg", "tol": 1e-12}
        opts.update(st.solver_opts)
        st.pde = ImplicitPDE(
            st.form,
            free,
            bcv,
            newton_iters=st.newton_iters,
            solver_opts=opts,
            extra_residual=st.extra_residual,
            facet_forms=st.facet_forms,
            element_matrices_fn=st.element_matrices_fn,
        )

    def _get_pde(self, name) -> ImplicitPDE:
        return self.states[name].pde

    def solve(self, name, params, u0=None):
        """Differentiable solve of one state. params: dict of input arrays
        (keys = the state's `arguments`). Parity with FEA.solve
        (fea_dolfinx.py:159-170)."""
        if self.custom_solve is not None:
            return self.custom_solve(self, name, params, u0)
        return self._get_pde(name).solve(params, u0=u0)

    def solveLinearFwd(self, name, u, params, dR):
        """Tangent solve (dR/du) du = dR at the linearization point u —
        named parity with FEA.solveLinearFwd (fea_dolfinx.py:173-187), which
        solves A du = dR with the transposed-MUMPS kit. Functionality also
        flows implicitly through ImplicitPDE's custom_vjp; this entry point
        serves external callers that drive their own chain rule."""
        pde = self._get_pde(name)
        return pde.make_solver(u, params).solve(pde.free_mask * dR)

    def solveLinearBwd(self, name, u, params, g):
        """Adjoint solve (dR/du)^T lam = g with BC rows of lam zeroed —
        named parity with FEA.solveLinearBwd (fea_dolfinx.py:189-203;
        post-zeroing per state_operation.py:217-218)."""
        pde = self._get_pde(name)
        lam = pde.make_solver(u, params).solve_transpose(pde.free_mask * g)
        return pde.free_mask * lam

    def add_exact_solution(self, name, fn):
        """Register an exact solution for a state (parity with
        add_exact_solution, fea_dolfinx.py:138-145): fn maps physical points
        (n, gdim) -> values, evaluated at quadrature points by
        `compute_error` (the errorNorm pattern, utils_dolfinx.py:244-256)."""
        self.exact_solutions = getattr(self, "exact_solutions", {})
        self.exact_solutions[name] = fn

    def compute_error(self, name, u, norm="L2"):
        """Error norm of a state against its registered exact solution."""
        from .utils import errorNorm

        space = self.states[name].form.space
        return errorNorm(space, jnp.asarray(u), self.exact_solutions[name],
                         norm=norm)

    def evaluate_output(self, name, vals):
        """vals: dict of state+input arrays. Returns scalar (device)."""
        return self._output_program(self.outputs, name)(
            self._output_args(self.outputs[name], vals))

    def evaluate_field_output(self, name, vals):
        return self._output_program(self.field_outputs, name)(
            self._output_args(self.field_outputs[name], vals))

    def _output_args(self, out, vals):
        """The subset of vals the output declares via `arguments` — keeps
        the jitted program's signature independent of previously computed
        outputs accumulating in vals. Outputs registered without arguments
        receive the full dict (their program retraces if its key set
        changes, which is benign for eager use)."""
        if out.arguments:
            return {k: vals[k] for k in out.arguments}
        return dict(vals)

    def _output_program(self, table, name):
        """Each output functional as ONE persistent jitted program (keyed by
        output name). On the hostloop execution path (adjoint/hostloop.py)
        the pipeline runs eagerly between staged solve programs; without
        this, every assemble_scalar would dispatch op-by-op — ~20 ms per op
        over the TPU tunnel (fea/pipeline.py). Inside a fused
        compile_pipeline trace the inner pjit call is simply absorbed."""
        cache = getattr(self, "_output_jits", None)
        if cache is None:
            cache = self._output_jits = {}
        key = (id(table), name)
        prog = cache.get(key)
        if prog is None:
            out = table[name]
            if out.form is not None:
                u_name = out.arguments[0]
                pkeys = list(out.arguments[1:])
                form = out.form

                def run(sub):
                    params = {k: sub[k] for k in pkeys}
                    return assemble_scalar(form, sub[u_name], params)

            else:
                run = out.fn
            import jax

            # fn outputs that manage their own staging (e.g. quadratic
            # fast paths with host-side coefficient caches,
            # assembly/quadratic.py) opt out of the wrapper jit: wrapped,
            # their concrete-vs-traced dispatch would always see tracers
            prog = cache[key] = (
                run if getattr(run, "no_jit", False) else jax.jit(run))
        return prog
