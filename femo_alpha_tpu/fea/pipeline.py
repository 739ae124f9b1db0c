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
