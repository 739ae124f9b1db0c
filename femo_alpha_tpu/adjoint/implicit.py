"""Differentiable implicit PDE solve via the implicit-function theorem.

This replaces the reference's hand-written adjoint plumbing
(state_operation.py:8-296: solve_residual_equations / compute_jacvec_product /
apply_inverse_jacobian, plus the UFL dR/du, dR/df form zoo of
set_up_fea_derivatives): `jax.custom_vjp` supplies the same mathematics —
  reverse:  solve A^T lam = g_u, then vjp_params = -(dR/dparams)^T lam
  forward:  solve A du = -(dR/dparams) dparams
— but the partials come from `jax.vjp`/`jax.jvp` through the assembled
residual, so no per-input derivative forms are ever written by hand.

BC treatment: the residual is "constrained" (BC rows = u - u_bc). The
linearized solve uses the symmetrically masked operator
B = f·A·f + (1-f)·I; solving B^T lam = f·g yields lam with zero entries at
BC dofs — exactly the reference's post-adjoint zeroing
(state_operation.py:217-218).

STAGED SOLVE PATH (default): the forward and backward passes run as two
PERSISTENT jitted programs compiled once per ImplicitPDE instance —
eager/per-call retracing of the Krylov while_loop and preconditioner setup
was the dominant cost of the library path (each eager `cg_solve` call
re-traces its closures). The linearized operator state (element-matrix
blocks + preconditioner state pytree) is passed from the forward pass to
the adjoint through the custom_vjp residuals, so the adjoint solve REUSES
the forward's preconditioner (the reference reuses the MUMPS factorization
the same way, state_operation.py:212-218 / utils_dolfinx.py:520-531).
Preconditioners participate through a split protocol:
    prepare(params) -> aux          (host side; may use content-hash caches,
                                     e.g. affine bases — assembly/affine.py)
    setup_state(u, params, ops_Ae, aux) -> state   (traceable pytree)
    apply_state(state, v) -> M^{-1} v              (traceable)
Legacy `precond_factory(u, params) -> M` callables still work through the
non-staged path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..assembly.assemble import (
    FemForm,
    assemble_residual,
    element_matrices,
)
from ..assembly.bc import constrain_residual
from ..solvers.linear import LinearSolver


class ImplicitPDE:
    """Bundles a residual (cell form + optional facet forms + optional extra
    terms) with BC data and a linear solver choice; exposes `solve(params)`
    that is end-to-end differentiable and jit-compatible (fixed Newton
    iteration count, while-loop Krylov inner).

    form: FemForm over the state space. facet_forms: list of FacetForm
    (e.g. penalty BC boundary integrals — their Jacobians enter the operator
    AND the preconditioner). extra_residual(u, params): non-form terms such
    as point loads. newton_iters: static count (1 for linear problems —
    parity with the reference's linear_problem fast path,
    state_operation.py:130; its NewtonSolver uses max_it=3,
    utils_dolfinx.py:449).
    """

    # registry of live instances, in creation order — lets
    # fea.pipeline.compile_pipeline harvest each PDE's host-prepared aux
    # and thread it through an outer jit as a runtime argument
    _instances: "list[ImplicitPDE]" = []

    def __init__(
        self,
        form: FemForm,
        free_mask=None,
        bc_vals=None,
        newton_iters=1,
        solver_opts=None,
        extra_residual=None,
        facet_forms=(),
        element_matrices_fn=None,
    ):
        self.form = form
        n = form.space.n_dofs
        self.n_dofs = n
        self.free_mask = jnp.ones(n) if free_mask is None else free_mask
        self.bc_vals = jnp.zeros(n) if bc_vals is None else bc_vals
        self.newton_iters = newton_iters
        self.solver_opts = dict(solver_opts or {})
        self.extra_residual = extra_residual
        self.facet_forms = list(facet_forms)
        # element_matrices_fn(u, params[, basis]) -> Ae: overrides the
        # generic jacfwd assembly of the cell operator — models wire fast
        # paths here (e.g. the affine design decomposition Ae = h*M1+h^3*M3,
        # assembly/affine.py: per-iteration re-assembly becomes two AXPYs)
        self.element_matrices_fn = element_matrices_fn
        # static op layout: fine operator + one block per facet group
        self._op_specs = [form.space] + [
            g["dofmap_d"] for ff in self.facet_forms for g in ff.groups
        ]
        pf = self.solver_opts.get("precond_factory")
        self._pc = pf if (pf is not None and hasattr(pf, "setup_state")) \
            else None
        self._staged = pf is None or self._pc is not None
        if self._staged:
            self._aux_now = None
            self._jit_fwd = jax.jit(self._newton_state)
            self._jit_bwd = jax.jit(self._bwd_impl)
            # hostloop twin (adjoint/hostloop.py): host-orchestrated CG over
            # the same staged programs — the TPU default, where one fused
            # f64-Krylov program is a compile-time pathology (round-2
            # VERDICT: 172s compile at 63k dofs, compile-helper OOM at
            # 988k). Dispatch happens INSIDE the custom_vjp fwd/bwd —
            # which receive concrete primal values even under an eager
            # jax.grad — not in solve(), which only ever sees tracers
            # during differentiation.
            from .hostloop import HostloopPrograms, hostloop_auto

            self._hostloop_enabled = hostloop_auto(self.solver_opts)
            self._hostloop = (HostloopPrograms(self)
                              if self._hostloop_enabled else None)
            self._solve = _build_staged_vjp(self)
        else:
            self._hostloop_enabled = False
            self._hostloop = None
            self._solve = _build_custom_vjp_solve(self)
        ImplicitPDE._instances.append(self)

    # -------------------------------------------------- raw pieces
    def residual(self, u, params):
        """Constrained residual: BC rows replaced by (u - u_bc)."""
        r = assemble_residual(self.form, u, params)
        for ff in self.facet_forms:
            r = r + ff.assemble_residual(u, params)
        if self.extra_residual is not None:
            r = r + self.extra_residual(u, params)
        return constrain_residual(r, u, self.free_mask, self.bc_vals)

    def _assemble_ops(self, u, params, emf_basis=None, facet_ops=None):
        """Element-matrix blocks in the static `_op_specs` layout. ops[0]
        is emitted in solver_opts['op0_layout'] ('cells' default; 'lane' =
        the pad-free (nd, nd, nc) TPU layout — an element_matrices_fn with
        a matching out_layout emits it directly, the generic assembly gets
        one relayout pass). facet_ops: host-precomputed facet Jacobian
        blocks (see `_prepare_facet_ops`) — passed as runtime arguments so
        the facet jacfwd kernels never enter device programs for linear
        problems."""
        if self.element_matrices_fn is not None:
            try:
                Ae0 = self.element_matrices_fn(u, params, basis=emf_basis)
            except TypeError:
                Ae0 = self.element_matrices_fn(u, params)
        else:
            Ae0 = element_matrices(self.form, u, params)
            if self.solver_opts.get("op0_layout") == "lane":
                Ae0 = jnp.moveaxis(Ae0, 0, -1)
        ops_Ae = [Ae0]
        if facet_ops is not None:
            ops_Ae.extend(facet_ops)
        else:
            for ff in self.facet_forms:
                ops_Ae.extend(Ae for Ae, _ in ff.element_ops(u, params))
        if getattr(self, "shard_spec", None) is not None:
            # multi-chip product path (parallel/product.py): split the fine
            # operator block over the cell axis; XLA's SPMD partitioner then
            # distributes every consumer (matvecs, smoothers, vjp kernels)
            from ..parallel.product import shard_ops

            ops_Ae = shard_ops(self, ops_Ae)
        return ops_Ae

    def _solver_from(self, ops_Ae, M_state, u, params) -> LinearSolver:
        ops = list(zip(ops_Ae, self._op_specs))
        if self.extra_residual is not None:
            _, extra_lin = jax.linearize(
                lambda v: self.extra_residual(v, params), u
            )
        else:
            extra_lin = None
        opts = dict(self.solver_opts)
        opts.pop("precond_factory", None)
        M = None
        if M_state is not None and self._pc is not None:
            M = lambda v: self._pc.apply_state(M_state, v)  # noqa: E731
        return LinearSolver(
            ops,
            self.n_dofs,
            free_mask=self.free_mask,
            extra_matvec=extra_lin,
            M=M,
            **opts,
        )

    def make_solver(self, u, params) -> LinearSolver:
        """Eager one-off construction (external callers / legacy path)."""
        opts = dict(self.solver_opts)
        pf = opts.pop("precond_factory", None)
        if pf is not None and hasattr(pf, "setup_state"):
            aux = pf.prepare(params)
            ops_Ae = self._assemble_ops(
                u, params,
                emf_basis=self.element_matrices_fn.prepare(params)
                if (self.element_matrices_fn is not None
                    and hasattr(self.element_matrices_fn, "prepare"))
                else None)
            M_state = pf.setup_state(u, params, ops_Ae, aux)
            return self._solver_from(ops_Ae, M_state, u, params)
        ops_Ae = self._assemble_ops(u, params)
        ops = list(zip(ops_Ae, self._op_specs))
        if self.extra_residual is not None:
            _, extra_lin = jax.linearize(
                lambda v: self.extra_residual(v, params), u
            )
        else:
            extra_lin = None
        M = pf(u, params) if pf is not None else None
        return LinearSolver(
            ops, self.n_dofs, free_mask=self.free_mask,
            extra_matvec=extra_lin, M=M, **opts,
        )

    def _setup_pc_state(self, u, params, ops_Ae, pc_aux):
        """Preconditioner state (traceable pytree), sharded over the cell
        axis when a multi-chip shard spec is installed
        (parallel/product.py: the V-cycle smoother matvecs then run SPMD
        like the fine operator's)."""
        if self._pc is None:
            return None
        st = self._pc.setup_state(u, params, ops_Ae, pc_aux)
        spec = getattr(self, "shard_spec", None)
        if spec is not None and hasattr(self._pc, "shard_state"):
            st = self._pc.shard_state(st, spec)
        return st

    # -------------------------------------------------- staged pieces
    def _newton_state(self, params, u0, aux):
        """Fixed-iteration Newton returning (u, linearization state)."""
        emf_basis, pc_aux, fops = aux
        f = self.free_mask
        u = f * u0 + (1.0 - f) * self.bc_vals
        ops_Ae, M_state = None, None
        for _ in range(self.newton_iters):
            r = self.residual(u, params)
            ops_Ae = self._assemble_ops(u, params, emf_basis=emf_basis,
                                        facet_ops=fops)
            M_state = self._setup_pc_state(u, params, ops_Ae, pc_aux)
            solver = self._solver_from(ops_Ae, M_state, u, params)
            du = solver.solve(r)
            u = u - du
        if self.newton_iters > 1:
            # re-linearize at the RETURNED u: the loop's last ops were
            # assembled before the final update, and the adjoint solve in
            # _bwd_impl must use J(u_N)^T, not J(u_{N-1})^T — a stale
            # linearization silently biases nonlinear gradients by
            # O(||u_N - u_{N-1}||). (Linear problems have state-independent
            # ops; skip the extra assembly.)
            ops_Ae = self._assemble_ops(u, params, emf_basis=emf_basis,
                                        facet_ops=fops)
            M_state = self._setup_pc_state(u, params, ops_Ae, pc_aux)
        return u, (ops_Ae, M_state)

    def _bwd_impl(self, params, u, ops_Ae, M_state, g):
        solver = self._solver_from(ops_Ae, M_state, u, params)
        lam = solver.solve_transpose(self.free_mask * g)
        lam = self.free_mask * lam
        _, vjp_fn = jax.vjp(lambda p: self.residual(u, p), params)
        (gp,) = vjp_fn(lam)
        return jax.tree.map(lambda a: -a, gp)

    def _prepare_facet_ops(self, params):
        """Host-precomputed facet Jacobian blocks, content-hash cached over
        the facet-relevant parameters (penalty blocks depend on uhat/
        geometry only). Linear problems only (newton_iters == 1: the facet
        Jacobian is state-independent); returns None — callers assemble in
        program — when a relevant parameter is traced (e.g. differentiating
        uhat) or the problem is nonlinear."""
        if not self.facet_forms or self.newton_iters != 1:
            return None
        import hashlib

        import jax.core
        import numpy as np

        rel = {}
        for ff in self.facet_forms:
            for k in ff.param_specs:
                rel[k] = params[k]
        if any(isinstance(v, jax.core.Tracer) for v in rel.values()):
            return None
        h = hashlib.sha1()
        for k in sorted(rel):
            h.update(k.encode())
            h.update(np.asarray(rel[k]).tobytes())
        ck = h.hexdigest()
        cached = getattr(self, "_fops_cache", None)
        if cached is not None and cached[0] == ck:
            return cached[1]
        from ..utils import diskcache
        from ..utils.offload import run_setup

        mesh = self.form.space.mesh
        hd = hashlib.sha1(ck.encode())
        hd.update(np.asarray(mesh.coords).tobytes())
        hd.update(np.asarray(mesh.conn).tobytes())
        hd.update(str(self.n_dofs).encode())
        dk = hd.hexdigest()
        arrs = diskcache.load("facetops", dk)
        if arrs is not None:
            # real arrays even under an ambient trace (see affine.py
            # _disk_load): cached tracers would leak
            with jax.ensure_compile_time_eval():
                fops = tuple(jnp.asarray(a) for a in arrs)
            self._fops_cache = (ck, fops)
            return fops
        u0 = np.zeros(self.n_dofs)

        def build(u0_, p_):
            out = []
            for ff in self.facet_forms:
                out.extend(Ae for Ae, _ in ff.element_ops(u0_, p_))
            return tuple(out)

        fops = run_setup(jax.jit(build), u0,
                        {k: np.asarray(v) for k, v in rel.items()})
        diskcache.store("facetops", dk, [np.asarray(a) for a in fops])
        self._fops_cache = (ck, fops)
        return fops

    def _prepare_aux(self, params):
        emb = None
        fn = self.element_matrices_fn
        if fn is not None and hasattr(fn, "prepare"):
            emb = fn.prepare(params)
        pca = ()
        if self._pc is not None:
            pca = self._pc.prepare(params)
        aux = (emb, pca, self._prepare_facet_ops(params))
        if getattr(self, "shard_spec", None) is not None:
            from ..parallel.product import shard_aux

            aux = shard_aux(self, aux)
        return aux

    def _newton(self, params, u0):
        """Legacy traceable Newton (used by the non-staged path)."""
        f = self.free_mask
        u = f * u0 + (1.0 - f) * self.bc_vals
        for _ in range(self.newton_iters):
            r = self.residual(u, params)
            solver = self.make_solver(u, params)
            du = solver.solve(r)
            u = u - du
        return u

    # -------------------------------------------------- public API
    def prepare_aux(self, params):
        """Host-side per-parameter setup (affine bases, preconditioner
        bases) as a pytree — pass to `solve(..., aux=...)` to thread it
        through an outer jit as a runtime argument instead of a trace
        constant (see fea.pipeline.compile_pipeline)."""
        return self._prepare_aux(params)

    def solve(self, params, u0=None, aux=None):
        """Differentiable solve. params: pytree of arrays the residual
        closes over via form.param_specs. aux: optional result of
        `prepare_aux` (may be a traced pytree under an outer jit); when
        omitted, it is prepared host-side — or taken from an active
        `fea.pipeline` aux override for this instance."""
        if u0 is None:
            u0 = jnp.zeros(self.n_dofs)
        if not self._staged:
            return self._solve(params, u0)
        if aux is None:
            from ..fea.pipeline import get_aux_override

            aux = get_aux_override(self)
        if aux is None:
            aux = self._prepare_aux(params)
            # cache host-prepared aux only (an override aux may be a traced
            # pytree — storing it would leak tracers to later eager calls)
            self._aux_now = aux
        from ..fea.pipeline import get_stage_stub

        stub = get_stage_stub()
        if stub is not None:
            return stub(self, params, u0, aux)
        return self._solve(params, u0, aux)


def _any_traced(tree) -> bool:
    import jax.core

    return any(isinstance(x, jax.core.Tracer)
               for x in jax.tree.leaves(tree))


def _build_staged_vjp(pde: ImplicitPDE):
    # aux is a formal custom_vjp argument (NOT a closure): under an outer
    # jit (fea.pipeline.compile_pipeline) it is a traced pytree, and
    # closures over tracers are illegal inside custom_vjp. Its cotangent
    # is zero by construction: the affine basis is exactly
    # design-independent, and non-design parameters are frozen while a
    # compiled pipeline is alive (see compile_pipeline docstring).
    def _hostloop_ok(*trees):
        return pde._hostloop is not None and not _any_traced(trees)

    @jax.custom_vjp
    def solve(params, u0, aux):
        if _hostloop_ok(params, u0, aux):
            u, _ = pde._hostloop.forward(params, u0, aux)
            return u
        u, _ = pde._jit_fwd(params, u0, aux)
        return u

    def fwd(params, u0, aux):
        if _hostloop_ok(params, u0, aux):
            u, state = pde._hostloop.forward(params, u0, aux)
        else:
            u, state = pde._jit_fwd(params, u0, aux)
        return u, (params, u, state, aux)

    def bwd(res, g):
        params, u, (ops_Ae, M_state), aux = res
        if _hostloop_ok(params, u, ops_Ae, M_state, g):
            lam = pde._hostloop.solve_adjoint(params, u, ops_Ae, M_state, g)
            gp = pde._hostloop.vjp_params(params, u, lam)
        else:
            gp = pde._jit_bwd(params, u, ops_Ae, M_state, g)
        zaux = jax.tree.map(jnp.zeros_like, aux)
        return gp, jnp.zeros_like(g), zaux

    solve.defvjp(fwd, bwd)
    return solve


def _build_custom_vjp_solve(pde: ImplicitPDE):
    @jax.custom_vjp
    def solve(params, u0):
        return pde._newton(params, u0)

    def fwd(params, u0):
        u = pde._newton(params, u0)
        return u, (params, u)

    def bwd(res, g):
        params, u = res
        solver = pde.make_solver(u, params)
        lam = solver.solve_transpose(pde.free_mask * g)
        lam = pde.free_mask * lam
        _, vjp_fn = jax.vjp(lambda p: pde.residual(u, p), params)
        (gp,) = vjp_fn(lam)
        gp = jax.tree.map(lambda a: -a, gp)
        return gp, jnp.zeros_like(u)

    solve.defvjp(fwd, bwd)
    return solve
