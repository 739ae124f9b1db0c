"""compile_pipeline: jit an entire model pipeline as ONE XLA program.

`RMShellModel.evaluate` / `FEA.solve` compose freely with user JAX code,
but calling them eagerly re-traces every surrounding op per call. On a
directly-attached backend that glue is noise; on the tunneled TPU backend
every eager dispatch costs ~20 ms and every retrace recompiles, so the
eager glue dominates (measured: 17.5 s/call at 2.7k dofs vs 1.9 s for the
same physics fused). The standard JAX answer is "jit your whole step" —
this helper makes that work for pipelines containing ImplicitPDE solves,
whose host-prepared aux (affine design bases, preconditioner bases —
assembly/affine.py) must cross the jit boundary as runtime ARGUMENTS:
closed over as trace constants they bloat the program by ~100 MB and XLA
constant-folds over them at compile time (see commit 6cd00a4).

Usage:
    run = compile_pipeline(jax.value_and_grad(objective), example_args)
    val, grad = run(*args)          # one fused XLA program per call

Semantics / contract:
  - The pipeline function is warmed ONCE eagerly at build time (this
    prepares each ImplicitPDE's aux host-side).
  - Differentiated/varying inputs must be the ARGUMENTS of `fn`. Any
    parameter baked into aux (e.g. the shell's E, nu, uhat — everything
    except the design field and pure load terms) is frozen at warm time;
    call `run.refresh(*args)` after changing one (re-warms eagerly and
    re-harvests aux). This matches the reference's lifecycle, which
    refactorizes MUMPS per design iteration but rebuilds forms only when
    the problem definition changes.
"""

from __future__ import annotations

import jax

_AUX_OVERRIDE: dict[int, object] = {}


def get_aux_override(pde):
    """The aux pytree an enclosing compile_pipeline trace registered for
    this ImplicitPDE instance, or None."""
    return _AUX_OVERRIDE.get(id(pde))


class _CompiledPipeline:
    def __init__(self, fn, example_args):
        self._fn = fn
        self._build(example_args)

    def _build(self, args):
        from ..adjoint.implicit import ImplicitPDE

        # Warm by ABSTRACT tracing: jax.eval_shape runs the pipeline with
        # tracer arguments but concrete closures, so each ImplicitPDE's
        # _prepare_aux still executes host-side (building real affine/MG
        # bases — non-design parameters are closures, hence concrete) while
        # ZERO device ops dispatch. An eager warm at 64x16 on the tunneled
        # TPU costs ~9 min (each first-seen eager op compiles); eval_shape
        # costs the host-side aux build only (seconds).
        try:
            jax.eval_shape(self._fn, *args)
        except Exception:
            self._fn(*args)  # host-callback pipelines: real eager warm
        pdes = [p for p in ImplicitPDE._instances
                if p._staged and p._aux_now is not None]
        self._pdes = pdes
        self._auxes = [p._aux_now for p in pdes]
        fn = self._fn

        # hostloop PDEs (adjoint/hostloop.py — the TPU path) run their
        # convergence loops on the host, so the pipeline CANNOT be one
        # fused program; instead it executes eagerly per call, with the
        # solves and per-output functionals as persistent jitted programs
        # (the glue between them dispatches asynchronously). This is the
        # same staging the round-1 bench proved at 988k dofs, now behind
        # the product API.
        self._eager = any(getattr(p, "_hostloop_enabled", False)
                          for p in pdes)
        if self._eager:
            self._inner = None
            return

        @jax.jit
        def inner(args, auxes):
            ids = [id(p) for p in self._pdes]
            _AUX_OVERRIDE.update(zip(ids, auxes))
            try:
                return fn(*args)
            finally:
                for i in ids:
                    _AUX_OVERRIDE.pop(i, None)

        self._inner = inner

    def __call__(self, *args):
        if self._eager:
            ids = [id(p) for p in self._pdes]
            _AUX_OVERRIDE.update(zip(ids, self._auxes))
            try:
                return self._fn(*args)
            finally:
                for i in ids:
                    _AUX_OVERRIDE.pop(i, None)
        return self._inner(args, self._auxes)

    def refresh(self, *args):
        """Re-warm eagerly (rebuilds aux for changed non-design
        parameters). The jitted program is reused — only aux arrays are
        replaced — unless shapes changed, in which case jit retraces."""
        self._fn(*args)
        self._auxes = [p._aux_now for p in self._pdes]
        return self


def compile_pipeline(fn, example_args):
    """Compile `fn(*args)` — a pipeline over model.evaluate()/FEA solves —
    into one persistent jitted program with every ImplicitPDE's aux
    threaded as runtime arguments. Returns a callable; see module
    docstring for the freeze/refresh contract."""
    return _CompiledPipeline(fn, tuple(example_args))


# ---------------------------------------------------------------------------
# staged value-and-grad for hostloop pipelines
# ---------------------------------------------------------------------------
#
# On the hostloop execution path (adjoint/hostloop.py — the TPU product
# path) a pipeline cannot be ONE jitted program: the solve's convergence
# loop runs on the host. The former answer was to execute the pipeline
# eagerly per call, but eager execution of the surrounding glue dispatches
# ~280 DISTINCT tiny device programs per forward+grad (broadcasts,
# converts, reductions of the output functionals and the eager AD
# machinery). On the tunneled TPU backend every one of those remote-
# compiles per process (~0.3-0.5 s each — measured 120 s first-eval
# compile at 63k dofs with every BIG program already disk-cached: the
# axon backend re-pays remote compilation per process) and costs a ~20 ms
# dispatch round trip per call afterwards (~0.7 s/eval of pure glue).
#
# stage_value_and_grad compiles the SAME pipeline into exactly TWO jitted
# programs around the host-driven solves:
#
#   probe(args, auxes, qcoeffs, u_filled) -> (params_k, u0_k) per solve
#   postgrad(args, pg, gp, u, auxes, qcoeffs)
#                                -> (J, aux_out, dJ/dargs, dJ/du_k)
#
# per call:  probe -> hostloop forward(s) -> postgrad (gp=0; yields J and
# the solve cotangents g_k) -> hostloop adjoint(s) -> postgrad (real gp;
# yields dJ/dargs).  The solve is stubbed inside the traced programs by a
# custom_vjp whose forward returns the host-computed u_k and whose
# backward injects the host-computed parameter cotangent gp_k while
# exporting the incoming cotangent g_k through a zero-valued probe input
# (the standard split-adjoint staging). Quadratic-output coefficients are
# threaded as runtime arguments too (assembly/quadratic.py override) so
# no per-cell kernel is ever traced into either program. Reference
# counterpart: the csdl graph evaluates operation-by-operation around
# MUMPS solves (state_operation.py); here the around-the-solve graph is
# two XLA programs instead of hundreds of eager ops.

_STAGE_STUBS: list = []


def get_stage_stub():
    """The innermost active solve stub (see stage_value_and_grad), or
    None. Consulted by ImplicitPDE.solve."""
    return _STAGE_STUBS[-1] if _STAGE_STUBS else None


class _StubCtx:
    def __init__(self, fn):
        self.fn = fn

    def __enter__(self):
        _STAGE_STUBS.append(self.fn)

    def __exit__(self, *exc):
        _STAGE_STUBS.pop()


def _zeros_like_tree(t):
    import jax.numpy as jnp

    return jax.tree.map(jnp.zeros_like, t)


@jax.custom_vjp
def _solve_stub(params, u0, u_k, gp_k, pg_k):
    return u_k + pg_k  # pg_k is zeros; keeps pg in the dependency graph


def _solve_stub_fwd(params, u0, u_k, gp_k, pg_k):
    return u_k + pg_k, (gp_k,)


def _solve_stub_bwd(res, g):
    (gp_k,) = res
    import jax.numpy as jnp

    return (gp_k, jnp.zeros_like(g), jnp.zeros_like(g),
            _zeros_like_tree(gp_k), g)


_solve_stub.defvjp(_solve_stub_fwd, _solve_stub_bwd)


class _StagedValueAndGrad:
    """value_and_grad(J, has_aux=...) over a hostloop pipeline as two
    persistent jitted programs + the host-driven solves. See module
    comment above. Non-design parameters follow the compile_pipeline
    freeze/refresh contract (aux/coefficients harvested at build time;
    call `refresh` after changing one)."""

    def __init__(self, J, example_args, has_aux=False):
        import jax.numpy as jnp

        self._J = J
        self._has_aux = has_aux

        # warm: collect hostloop PDE instances in CALL order (abstract
        # trace — host-side aux and quadratic-coefficient builds run for
        # real, zero device dispatch). Under the abstract warm, params
        # leaves derived from `args` are tracers and FROZEN leaves (the
        # compile_pipeline freeze contract) are concrete: record the
        # classification + the frozen VALUES. The per-call probe then
        # outputs only the varying leaves, and the hostloop receives the
        # SAME frozen array objects every call — its identity-keyed host
        # caches (_params_host, the zero-state load residual) keep
        # hitting, where probe-fresh buffers re-paid a host transfer per
        # truth evaluation per eval.
        order = []
        frozen = []  # (treedef, [concrete-or-None per leaf]) per solve

        def _is_conc(x):
            import jax.core

            return not isinstance(x, jax.core.Tracer)

        def order_stub(pde, params, u0, aux):
            if pde not in order:
                order.append(pde)
                leaves, treedef = jax.tree.flatten((params, u0))
                # store concrete leaves AS-IS: jnp.asarray under the
                # active trace routes through an op and returns a TRACER
                # even for concrete input (it would leak out of the warm)
                frozen.append(
                    (treedef,
                     [v if _is_conc(v) else None for v in leaves]))
            return jnp.zeros(pde.n_dofs)

        with _StubCtx(order_stub):
            try:
                jax.eval_shape(J, *example_args)
            except Exception:
                # eager fallback: everything looks concrete — disable the
                # frozen-leaf classification (treat all leaves as varying)
                order.clear()
                frozen.clear()
                with _StubCtx(order_stub):
                    J(*example_args)
                frozen = [(td, [None] * len(vals))
                          for td, vals in frozen]
        self._pdes = [p for p in order
                      if getattr(p, "_hostloop_enabled", False)]
        if not self._pdes or len(self._pdes) != len(order):
            raise NotImplementedError(
                "stage_value_and_grad requires every solve on the hostloop "
                "path; other pipelines should use compile_pipeline")
        self._frozen = frozen
        self._auxes = [p._aux_now for p in self._pdes]

        from ..assembly.quadratic import QuadraticOutput, _COEFF_OVERRIDE

        self._qos = [q for q in QuadraticOutput._instances
                     if q._coeffs is not None]
        self._qcoeffs = [q._coeffs for q in self._qos]
        pdes = self._pdes
        qos = self._qos

        def _with_overrides(auxes, qcoeffs):
            _AUX_OVERRIDE.update({id(p): a for p, a in zip(pdes, auxes)})
            _COEFF_OVERRIDE.update(
                {id(q): c for q, c in zip(qos, qcoeffs)})

        def _clear_overrides():
            for p in pdes:
                _AUX_OVERRIDE.pop(id(p), None)
            for q in qos:
                _COEFF_OVERRIDE.pop(id(q), None)

        frozen_masks = [[v is not None for v in vals]
                        for _, vals in frozen]

        @jax.jit
        def probe(args, auxes, qcoeffs, u_filled):
            _with_overrides(auxes, qcoeffs)
            rec = []

            def capture(pde, params, u0, aux):
                k = len(rec)
                leaves = jax.tree.leaves((params, u0))
                # output only the args-VARYING leaves (see order_stub):
                # frozen ones are reattached host-side from stable arrays
                rec.append([v for v, fz in zip(leaves, frozen_masks[k])
                            if not fz])
                return u_filled[k]

            try:
                with _StubCtx(capture):
                    J(*args)
            finally:
                _clear_overrides()
            return rec

        @jax.jit
        def postgrad(args, pg_list, gp_list, u_list, auxes, qcoeffs):
            _with_overrides(auxes, qcoeffs)

            def run(args, pg_list):
                counter = iter(range(len(pdes)))

                def inject(pde, params, u0, aux):
                    k = next(counter)
                    return _solve_stub(params, u0, u_list[k],
                                       gp_list[k], pg_list[k])

                with _StubCtx(inject):
                    return J(*args)

            try:
                if has_aux:
                    val, vjp, aux_out = jax.vjp(run, args, pg_list,
                                                has_aux=True)
                else:
                    val, vjp = jax.vjp(run, args, pg_list)
                    aux_out = None
                ga, gpg = vjp(jnp.ones_like(val))
            finally:
                _clear_overrides()
            return val, aux_out, ga, gpg

        self._probe = probe
        self._postgrad = postgrad

    _TRACE = bool(__import__("os").environ.get("FEMO_STAGE_TRACE"))

    def _t(self, label, t0):
        if self._TRACE:
            import time

            from ..utils.logging import log

            log(f"stage[{label}]: {time.perf_counter() - t0:.3f}s")
            return time.perf_counter()
        return t0

    def __call__(self, *args):
        import time

        import jax.numpy as jnp

        t0 = time.perf_counter() if self._TRACE else 0.0
        pdes = self._pdes
        auxes = self._auxes
        qc = self._qcoeffs
        n = len(pdes)
        # constant zero templates built once (each jnp.zeros is a device
        # dispatch — ~20 ms on the tunneled backend)
        z0 = getattr(self, "_zeros0", None)
        if z0 is None:
            z0 = self._zeros0 = [jnp.zeros(p.n_dofs) for p in pdes]
        u_list = list(z0)
        states = [None] * n
        cap = None

        def _assemble_pu(k, cap):
            treedef, vals = self._frozen[k]
            it = iter(cap[k])
            leaves = [v if v is not None else next(it) for v in vals]
            return jax.tree.unflatten(treedef, leaves)

        # sequential probes: solve k's params may depend on earlier
        # solves' solutions; one compiled probe program, re-run with the
        # u's found so far (n == 1: a single run)
        for k in range(n):
            cap = self._probe(args, auxes, qc, u_list)
            if self._TRACE:
                cap = jax.block_until_ready(cap)
            t0 = self._t("probe", t0)
            params_k, u0_k = _assemble_pu(k, cap)
            u, st = pdes[k]._hostloop.forward(params_k, u0_k, auxes[k])
            u_list[k] = u
            states[k] = (params_k, st)
            t0 = self._t("hostloop.forward", t0)
        pg0 = list(z0)
        gp = getattr(self, "_gp0", None)
        if gp is None:
            gp = [_zeros_like_tree(_assemble_pu(k, cap)[0])
                  for k in range(n)]
            self._gp0 = [jax.tree.map(lambda a: a, g) for g in gp]
        else:
            gp = list(gp)
        val, aux_out, _, g_list = self._postgrad(args, pg0, gp, u_list,
                                                 auxes, qc)
        if self._TRACE:
            g_list = jax.block_until_ready(g_list)
        t0 = self._t("postgrad1", t0)
        # adjoint solves in reverse call order; for n > 1 the cotangent
        # reaching solve k flows through LATER solves' gp, so re-evaluate
        # the staged program as those fill in
        for k in reversed(range(n)):
            if n > 1 and k < n - 1:
                _, _, _, g_list = self._postgrad(args, pg0, gp, u_list,
                                                 auxes, qc)
            params_k, (ops_Ae, M_state) = states[k]
            hl = pdes[k]._hostloop
            lam = hl.solve_adjoint(params_k, u_list[k], ops_Ae, M_state,
                                   g_list[k])
            gp[k] = hl.vjp_params(params_k, u_list[k], lam)
            t0 = self._t("hostloop.adjoint", t0)
        _, _, ga, _ = self._postgrad(args, pg0, gp, u_list, auxes, qc)
        if self._TRACE:
            ga = jax.block_until_ready(ga)
        t0 = self._t("postgrad2", t0)
        grad = ga[0] if len(ga) == 1 else ga
        if self._has_aux:
            return (val, aux_out), grad
        return val, grad

    def refresh(self, *args):
        with _StubCtx(lambda pde, params, u0, aux: __import__(
                "jax.numpy", fromlist=["zeros"]).zeros(pde.n_dofs)):
            try:
                jax.eval_shape(self._J, *args)
            except Exception:
                self._J(*args)
        self._auxes = [p._aux_now for p in self._pdes]
        self._qcoeffs = [q._coeffs for q in self._qos]
        return self


def stage_value_and_grad(J, example_args, has_aux=False):
    """value_and_grad(J) over a pipeline whose solves all run on the
    hostloop path, staged as two persistent jitted programs (see module
    comment). Falls back to compile_pipeline(jax.value_and_grad(J)) when
    the pipeline has no hostloop solve."""
    try:
        return _StagedValueAndGrad(J, tuple(example_args), has_aux=has_aux)
    except NotImplementedError:
        return compile_pipeline(
            jax.value_and_grad(J, has_aux=has_aux), tuple(example_args))
