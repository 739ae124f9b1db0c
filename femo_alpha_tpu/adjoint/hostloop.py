"""Host-orchestrated staged solve for ImplicitPDE — the TPU product path.

One fused XLA program per model pipeline (fea/pipeline.py) is the right
call on CPU, but on TPU the f64 Krylov while_loop is software-emulated and
the fused value_and_grad program grows past what the compile toolchain
survives (measured round 2: 172.7 s compile at 63k dofs; compile-helper
OOM-kill at 988k). The reference never fuses either: its per-iteration
flow is assemble -> MUMPS factor -> forward solve -> transposed solve as
separate native calls (state_operation.py:86-131, :188-220). This module
is the TPU-native equivalent of that staging: a handful of PERSISTENT
jitted programs per ImplicitPDE instance

    asm(params, u, aux)      -> residual, element ops, preconditioner state
    start(... b)             -> preconditioned CG seed
    chunk(... cg state ...)  -> `chunk` fixed-trip CG iterations
    true_res(... x, b)       -> true residual + re-seeded CG state
    vjp_params(params,u,lam) -> -(dR/dparams)^T lam

with the convergence loop on the HOST (one scalar sync per chunk). Each
program is small, compiles in seconds, and is reused verbatim by the
forward and adjoint solves of every design iteration (same programs, new
arguments). The CG vector state uses float-float (two f32 words) on TPU
f64 systems — solvers/dfloat.py; measured 2.8-16x over XLA-emulated f64
vector ops — while the operator and preconditioner stay the solver's own
dtype.

Requires concrete (non-traced) inputs: the loop runs on the host. Under a
JAX trace, ImplicitPDE.solve dispatches to the fused staged path instead
(adjoint/implicit.py), so jit'd pipelines keep working.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import log

_TRACE = os.environ.get("FEMO_HOSTLOOP_TRACE") == "1"


def _traced(name, fn):
    """FEMO_HOSTLOOP_TRACE=1: log wall time of every call to a jitted stage
    program (first call = compile+run; later calls = dispatch+run)."""
    if not _TRACE:
        return fn

    def wrapped(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        jax.block_until_ready(out)
        log(f"hostloop[{name}]: {time.perf_counter() - t0:.3f}s")
        return out

    return wrapped


def hostloop_auto(solver_opts) -> bool:
    """Whether the hostloop execution path should drive this PDE's solves.

    solver_opts['execution']: 'hostloop' | 'fused' | 'auto' (default).
    auto = TPU backend + iterative symmetric CG (the configuration whose
    fused compile is pathological; CPU f64 is native and fuses fine).
    """
    # the hostloop is a PCG orchestration: it only ever applies to the
    # iterative symmetric configuration, no matter what overrides say
    # (dense/direct solves have nothing to chunk; GMRES state does not
    # fit the chunk protocol)
    if (solver_opts.get("method", "cg") != "cg"
            or not solver_opts.get("symmetric", True)):
        return False
    mode = solver_opts.get("execution", "auto")
    if mode == "hostloop":
        return True
    if mode == "fused":
        return False
    import os

    flag = os.environ.get("FEMO_HOSTLOOP")
    if flag is not None:
        return flag == "1"
    return jax.default_backend() == "tpu"


def _identity(x):
    return x


class HostloopPrograms:
    """Persistent jitted stage programs + host CG orchestration for one
    ImplicitPDE. All element ops / preconditioner state / parameters are
    runtime ARGUMENTS so one compiled program serves every design
    iteration (and both the forward and the adjoint solve)."""

    def __init__(self, pde):
        self.pde = pde
        opts = pde.solver_opts
        self.tol = float(opts.get("tol", 1e-12))
        n = pde.n_dofs
        # iteration ceiling: a backstop, not the convergence mechanism.
        # MG/band-preconditioned solves converge in tens of iterations at
        # any size that fits one chip; a solve still running after a few
        # thousand is stalled at its attainable floor, and the in-loop
        # stall break (solve_linear) + outer refinement own that case.
        # The old min(10*n, 200k) ceiling let ONE stalled 988k-dof solve
        # burn 1563 x 12.7 s chunks (~5.5 h) before giving up.
        self.maxiter = int(opts.get("maxiter")
                           or min(max(500, 10 * n), 8192))
        # chunk: fixed-trip CG iterations per host round trip. Each chunk
        # sync over the tunneled TPU costs ~20 ms; converged iterations
        # inside a chunk self-deactivate (the `active` mask), so a larger
        # chunk trades bounded wasted VPU work for far fewer syncs.
        self.chunk = int(opts.get("chunk", 128))
        self.restarts = int(opts.get("restarts", 4))
        # outer refinement passes beyond the mandated Newton iterations:
        # re-assemble the residual at the updated state and re-solve the
        # correction (classical iterative refinement — what MUMPS does
        # after its factor/solve). The loop exits at the residual-
        # MEASUREMENT floor eps_dev * |||A||u| + |b||| (utils/quality.py:
        # below it the metric is pure cancellation noise; a SuperLU direct
        # solve measures the same value — tools/floor_experiment.py), so
        # passes are never burned chasing an unreachable target.
        self.refine_passes = int(opts.get("refine_passes", 2))
        # floor constant: measured floors sit at ~0.5x eps*|||A||u|+|b|||
        # (CPU 1.27e-8 vs predictor 3.0e-8 at 63k); 0.5 stops right at the
        # achievable value without burning a no-progress pass
        self.floor_c = float(opts.get("floor_c", 0.5))
        # attainable TRUE-residual accuracy of one inner PCG solve,
        # relative to its own RHS. An f32 preconditioner (the TPU V-cycle)
        # perturbs every application at ~eps_f32 relative, so CG stalls at
        # ~1-4x eps_f32 true relative residual no matter the vector
        # precision (measured trails: 2.4e-7 -> 8.7e-8 -> 8.4e-8 across
        # restarts — a <3x gain for 2x the iterations). solve_linear never
        # targets below this; the OUTER refinement multiplies accuracy
        # across passes instead (each pass is a fresh solve on a fresh
        # host-f64 RHS, so the per-solve floor compounds geometrically).
        # Adaptive: raised toward an observed stall, relaxed slowly when
        # solves beat it with room to spare.
        self.inner_attain = float(opts.get("inner_attain", 1.5e-7))
        self._attain_explicit = "inner_attain" in opts
        # quality bar for the loud warning (the north-star accuracy bar;
        # tol itself may sit below the f64 floor by design)
        self.warn_rel = float(opts.get("warn_rel", 1e-8))
        from ..utils.quality import device_f64_eps

        self.eps_dev = device_f64_eps()
        # AFFINE-LINEAR FAST PATH: when the PDE is linear (one mandated
        # Newton step), its operator comes from an affine design
        # decomposition (element_matrices_fn with host-side prepare), and
        # there are no facet/extra terms, the residual is EXACTLY
        # r(u) = mv(u) - c0 with c0 from ONE host-CPU f64 assembly at the
        # BC-consistent zero state. Then NO program containing a per-cell
        # energy kernel ever compiles on the device — the dominant cost of
        # the tunneled-TPU path (each kernel-bearing program remote-compiles
        # in ~30-150 s; utils/offload.py header). The design-gradient vjp
        # runs on the host CPU backend too (measured 126 ms at 63k dofs on
        # the 1-core build host vs a ~150 s remote compile). Reference
        # lifecycle analogue: FFCx compiles forms ONCE on the host; the
        # device only ever executes assembled operators
        # (state_operation.py:260-296).
        fn = pde.element_matrices_fn
        self.affine = bool(
            pde.newton_iters == 1
            and pde.extra_residual is None
            and fn is not None and hasattr(fn, "prepare")
        )
        if os.environ.get("FEMO_HOSTLOOP_AFFINE") is not None:
            self.affine = (self.affine
                           and os.environ["FEMO_HOSTLOOP_AFFINE"] == "1")
        # telemetry of the most recent forward/adjoint (CG iterations,
        # refinement passes, final true rel_res) — solver observability,
        # read by benchmarks and tests
        self.last_stats = {}
        self._build_programs()

    # ---------------------------------------------------------- programs
    def _build_programs(self):
        pde = self.pde

        def mv_M(params, u, ops_Ae, M_state):
            solver = pde._solver_from(ops_Ae, M_state, u, params)
            return solver.matvec, (solver.M or _identity)

        @jax.jit
        def asm(params, u0, aux):
            emf_basis, pc_aux, fops = aux
            f = pde.free_mask
            u = f * u0 + (1.0 - f) * pde.bc_vals
            r = pde.residual(u, params)
            ops_Ae = pde._assemble_ops(u, params, emf_basis=emf_basis,
                                       facet_ops=fops)
            M_state = (pde._pc.setup_state(u, params, ops_Ae, pc_aux)
                       if pde._pc is not None else None)
            return u, r, ops_Ae, M_state

        @jax.jit
        def start(params, u, ops_Ae, M_state, b):
            _, M = mv_M(params, u, ops_Ae, M_state)
            z = M(b)
            return z, jnp.vdot(b, z), jnp.linalg.norm(b)

        def chunk_plain_of(size):
            @jax.jit
            def chunk_plain(params, u, ops_Ae, M_state, x, r, z, p, rz,
                            target):
                from ..solvers.krylov import cg_chunk_iterations

                mv, M = mv_M(params, u, ops_Ae, M_state)
                return cg_chunk_iterations(mv, M, size, x, r, z, p, rz,
                                           target, count=True)

            return chunk_plain

        def chunk_df_of(size):
            @jax.jit
            def chunk_df(params, u, ops_Ae, M_state, x, r, z, p, rz64,
                         target):
                from ..solvers.dfloat import (
                    df_axpy,
                    df_dot,
                    df_from_f64,
                    df_neg,
                    df_to_f64,
                )

                mv, M = mv_M(params, u, ops_Ae, M_state)

                def body(_, st):
                    x, r, z, p, rz64, n = st
                    Ap = df_from_f64(mv(df_to_f64(p)))
                    pAp64 = df_to_f64(df_dot(p, Ap))
                    rnorm2 = df_to_f64(df_dot(r, r))
                    active = rnorm2 > target * target
                    alpha64 = jnp.where(
                        active, rz64 / jnp.where(pAp64 != 0, pAp64, 1.0),
                        0.0)
                    alpha = df_from_f64(alpha64)
                    x = df_axpy(alpha, p, x)
                    r = df_axpy(df_neg(alpha), Ap, r)
                    z = df_from_f64(M(df_to_f64(r)))
                    rz_new64 = df_to_f64(df_dot(r, z))
                    beta64 = jnp.where(
                        active, rz_new64 / jnp.where(rz64 != 0, rz64, 1.0),
                        0.0)
                    p = df_axpy(df_from_f64(beta64), p, z)
                    rz64 = jnp.where(active, rz_new64, rz64)
                    n = n + active.astype(n.dtype)
                    return (x, r, z, p, rz64, n)

                x, r, z, p, rz64, n = jax.lax.fori_loop(
                    0, size, body,
                    (x, r, z, p, rz64, jnp.zeros((), jnp.int32)))
                return x, r, z, p, rz64, jnp.sqrt(df_to_f64(df_dot(r, r))), n

            return chunk_df

        # chunk programs per (trip count, vector representation), built
        # lazily: a solve that history says needs ~25 iterations runs a
        # 32-trip program, not a 128-trip one — converged lanes
        # self-deactivate but still pay the matvec+preconditioner, which
        # on the band path costs ~22 ms/iteration (wing measurements)
        self._chunk_cache = {}
        self._chunk_plain_of = chunk_plain_of
        self._chunk_df_of = chunk_df_of
        # per-call-site converged-iteration history (EWMA), keyed by the
        # caller's est_key — drives the chunk-size schedule. Both the
        # history and the adapted inner_attain PERSIST on disk per problem
        # (utils/diskcache): without this, every fresh process re-pays the
        # cold-start burn discovering the attainable accuracy and the
        # right chunk sizes — at 988k dofs that discovery costs minutes of
        # 12.7 s chunks, and the driver benchmark runs in a fresh process
        # by design (bench.py child isolation).
        self._est = {}
        self._telem_key = self._problem_content_key()
        # consecutive-stall counter: one transient stall (cold caches, a
        # warm start gone bad) must not persist a loosened inner_attain
        self._attain_raises = 0
        self._load_telemetry()
        # the value that goes to disk: raises are persisted only after 2+
        # consecutive stalled solves confirm a real attainability floor;
        # relaxations persist immediately
        self._attain_persist = self.inner_attain

        @jax.jit
        def res0(params):
            """Problem-scale reference: residual norm at the BC-consistent
            zero state (= the load norm for linear problems). Newton/
            refinement convergence is judged relative to THIS, never to a
            warm-start residual — a warm start at the solution has a
            noise-floor residual, and dividing by it turns 'converged'
            into 'diverged' (and makes every CG target unreachable)."""
            f = pde.free_mask
            u = (1.0 - f) * pde.bc_vals
            return jnp.linalg.norm(pde.residual(u, params))

        @jax.jit
        def true_res(params, u, ops_Ae, M_state, x, b):
            """True residual at x + re-seeded CG state (restart)."""
            mv, M = mv_M(params, u, ops_Ae, M_state)
            r = b - mv(x)
            z = M(r)
            return r, z, jnp.vdot(r, z), jnp.linalg.norm(r)

        @jax.jit
        def vjp_params(params, u, lam):
            _, vjp_fn = jax.vjp(lambda p: pde.residual(u, p), params)
            (gp,) = vjp_fn(lam)
            return jax.tree.map(lambda a: -a, gp)

        @jax.jit
        def adj_true_res(params, u, lam, b):
            """Assembly-grade adjoint residual b - f*(dR/du)^T(f*lam): the
            vjp through the per-cell energy-gradient assembly, not the
            gathered element-matrix matvec — the refinement ground truth."""
            f = pde.free_mask
            _, vjp_fn = jax.vjp(lambda v: pde.residual(v, params), u)
            (Atlam,) = vjp_fn(f * lam)
            r = b - f * Atlam
            return r, jnp.linalg.norm(r)

        from ..utils.quality import make_abs_matvec

        _abs_mv = make_abs_matvec(pde)

        @jax.jit
        def floor_scale(ops_Ae, x, bnorm):
            """|||A||x| + |b|||: the scale of unavoidable cancellation noise
            in evaluating r = b - A x. eps_dev times this is the residual-
            norm measurement floor (utils/quality.py docstring)."""
            return jnp.linalg.norm(_abs_mv(ops_Ae, x)) + bnorm

        # ------------------------- affine fast-path programs (kernel-free)
        @jax.jit
        def asm_affine(params, u0, aux):
            """Like `asm` but WITHOUT the residual assembly: the affine
            combine + preconditioner setup only (pure tensor algebra;
            facet blocks arrive host-precomputed in aux)."""
            emf_basis, pc_aux, fops = aux
            f = pde.free_mask
            u = f * u0 + (1.0 - f) * pde.bc_vals
            ops_Ae = pde._assemble_ops(u, params, emf_basis=emf_basis,
                                       facet_ops=fops)
            M_state = (pde._setup_pc_state(u, params, ops_Ae, pc_aux)
                       if pde._pc is not None else None)
            return u, ops_Ae, M_state

        def res_host(params, u):
            """Constrained residual + its norm — run on the HOST CPU
            backend in NATIVE f64 (unit roundoff 2^-53 vs the device's
            float-float 2^-48): the refinement ground truth of the affine
            path. Measured 33 ms/call at 63k dofs on the 1-core host."""
            r = pde.residual(u, params)
            return r, jnp.linalg.norm(r)

        def adj_res_host(params, u, lam, b):
            """Adjoint truth b - f*(dR/du)^T(f*lam) on the host (f64)."""
            f = pde.free_mask
            _, vjp_fn = jax.vjp(lambda v: pde.residual(v, params), u)
            (Atlam,) = vjp_fn(f * lam)
            r = b - f * Atlam
            return r, jnp.linalg.norm(r)

        self._res_host_jit = _traced("res_host", jax.jit(res_host))
        self._adjres_host_jit = _traced("adjres_host", jax.jit(adj_res_host))
        self._vjp_host_jit = _traced("vjp_host", jax.jit(vjp_params))

        self._asm = _traced("asm", asm)
        self._asm_affine = _traced("asm_affine", asm_affine)
        self._res0 = _traced("res0", res0)
        self._start = _traced("start", start)
        self._true_res = _traced("true_res", true_res)
        self._adj_true_res = _traced("adj_true_res", adj_true_res)
        self._floor_scale = _traced("floor_scale", floor_scale)
        self._vjp_device = _traced("vjp_params", vjp_params)

    # ------------------------------------------------------ host solves
    def _use_df(self, dtype):
        from ..solvers.linear import _use_df_vectors

        return _use_df_vectors(dtype)

    _SIZES = (16, 32, 64)

    def _chunk_prog(self, size, df):
        key = (int(size), bool(df))
        fn = self._chunk_cache.get(key)
        if fn is None:
            fn = (self._chunk_df_of if df else self._chunk_plain_of)(size)
            fn = _traced(f"chunk{'_df' if df else ''}[{size}]", fn)
            self._chunk_cache[key] = fn
        return fn

    def _pick_size(self, est):
        for s in self._SIZES:
            if s < self.chunk and est <= 0.85 * s:
                return s
        return self.chunk

    def _problem_content_key(self):
        """Telemetry cache key: a CONTENT hash of the constrained problem
        (free/BC layout + the operator's dof geometry when reachable), not
        just its size — unrelated problems with equal dof counts must not
        share an adapted inner_attain across processes (advisor r4)."""
        import hashlib

        pde = self.pde
        h = hashlib.sha1(f"{pde.n_dofs}|{pde.newton_iters}".encode())
        for arr in (pde.free_mask, pde.bc_vals):
            h.update(np.asarray(arr, dtype=np.float64).tobytes())
        mesh = getattr(getattr(pde.form, "space", None), "mesh", None)
        nodes = getattr(mesh, "nodes", None)
        if nodes is not None:
            h.update(np.asarray(nodes, dtype=np.float64).tobytes())
        return h.hexdigest()[:20]

    # decay applied to a PERSISTED inner_attain on load: a spurious raise
    # washes out over a few processes (each re-load halves the excess over
    # the default), while a real attainability floor re-raises itself on
    # the first stalled solve of the new process
    _ATTAIN_LOAD_DECAY = 0.5

    def _load_telemetry(self):
        """Seed inner_attain and the converged-iteration history from the
        setup disk cache (content-keyed per problem, _problem_content_key).
        Best-effort performance hints only — every value they influence is
        verified against measured truth by the solve/refinement loops, so
        a stale entry costs iterations, never accuracy."""
        from ..utils import diskcache

        rec = diskcache.load("hloop", self._telem_key)
        if not rec or len(rec) != 3:
            return
        try:
            if not self._attain_explicit:
                stored = float(rec[0])
                base = self.inner_attain
                self.inner_attain = (base + self._ATTAIN_LOAD_DECAY
                                     * max(stored - base, 0.0))
            keys, vals = rec[1], rec[2]
            self._est = {str(k): int(v) for k, v in zip(keys, vals)}
        except Exception:
            self._est = {}

    def _store_telemetry(self):
        from ..utils import diskcache

        ks = list(self._est.keys())
        diskcache.store("hloop", self._telem_key, [
            np.asarray(getattr(self, "_attain_persist", self.inner_attain)),
            np.asarray(ks, dtype=np.str_),
            np.asarray([self._est[k] for k in ks], dtype=np.int64),
        ])

    def vjp_params(self, params, u, lam):
        """-(dR/dparams)^T lam. Affine path: evaluated on the host CPU
        backend (native f64, compiles in seconds, ~0.1-0.2 s/call at 63k
        dofs) — the only place the per-cell kernel runs at all on that
        path. Generic path: the device program."""
        if self.affine:
            import numpy as np

            from ..utils.offload import run_setup

            return run_setup(self._vjp_host_jit, self._params_host(params),
                             np.asarray(u, dtype=np.float64),
                             np.asarray(lam, dtype=np.float64))
        return self._vjp_device(params, u, lam)

    def _params_host(self, params):
        """Numpy copies of the params tree, cached by leaf object identity:
        the host truth programs (res/adj_res/vjp) are called 4-8 times per
        eval with the SAME params, and each un-cached call re-pulls every
        array over the tunnel (~20 ms × n_arrays × n_calls). The custom_vjp
        residuals keep the forward's leaf objects alive, so identity is a
        sound content key within one forward+adjoint."""
        import numpy as np

        leaves = jax.tree.leaves(params)
        cached = getattr(self, "_ph_cache", None)
        # the cache HOLDS the leaf objects (not just their ids): ids are
        # only unique among live objects, and after an optimizer step the
        # old leaves are GC'd and CPython reuses their addresses — an
        # id()-keyed cache then serves the PREVIOUS design's parameters to
        # the host truth programs (silently wrong residuals/gradients).
        # Pinning the leaves makes `is`-comparison a sound content key.
        if (cached is not None and len(cached[0]) == len(leaves)
                and all(a is b for a, b in zip(cached[0], leaves))):
            return cached[1]
        ph = jax.tree.map(lambda a: np.asarray(a), params)
        self._ph_cache = (list(leaves), ph)
        return ph

    def _host_res(self, params, u_np):
        """Host-CPU f64 constrained residual at `u_np` (numpy). Returns
        (r on the default device, norm float)."""
        from ..utils.offload import run_setup

        r, rn = run_setup(self._res_host_jit, self._params_host(params),
                          u_np)
        return r, float(rn)

    def _host_adj_res(self, params, u_np, lam_np, b_np):
        from ..utils.offload import run_setup

        r, rn = run_setup(self._adjres_host_jit, self._params_host(params),
                          u_np, lam_np, b_np)
        return r, float(rn)

    def solve_linear(self, params, u, ops_Ae, M_state, b, label="",
                     abs_target=0.0, x0=None, est_key=None, bnorm=None):
        """Host-chunked PCG for the constrained system, with true-residual
        restarts: the loop exits on the recurrence residual, verifies
        against b - A x, and re-enters (fresh Krylov space) until the TRUE
        residual meets the target or maxiter is exhausted. Returns
        (x, iters, true_relres).

        `abs_target` is the caller's ABSOLUTE residual-norm floor (e.g.
        tol × the outer problem scale). Refinement passes solve tiny-RHS
        correction systems: without the floor, the relative target
        tol·||b|| sits below the attainable accuracy and the loop burns
        the full maxiter×restarts budget for nothing (measured: 25 s/eval
        at 63k dofs on the tunneled TPU). Callers scale it to the
        attainable accuracy of THIS solve's RHS (eps_dev·|||A||x|+|b||| of
        the correction, not of the outer solution) so the loop neither
        quits early nor burns restarts confirming an unreachable target.

        `x0`: optional warm start (e.g. the previous optimizer iteration's
        adjoint, or the self-adjoint seed alpha*u — see solve_adjoint).
        `est_key`: history key for the converged-iteration estimator — the
        first chunk is sized to the previous converged count at this call
        site (16/32/64/chunk), so a solve that needs ~25 iterations does
        not pay for 128 (converged lanes self-deactivate but still run
        the matvec+preconditioner: ~22 ms/iteration on the band path).
        `bnorm`: pass ||b|| when the caller already knows it (host-truth
        residuals return their norm) — every host sync on the tunneled
        backend costs ~20-25 ms."""
        if bnorm is None:
            bnorm = float(jnp.linalg.norm(b))
        if bnorm == 0.0:
            return jnp.zeros_like(b), 0, 0.0
        if bnorm <= abs_target:
            # converged by the caller's absolute floor with x = 0: the
            # relative residual of that x is by definition 1
            return jnp.zeros_like(b), 0, 1.0
        target = jnp.asarray(
            max(self.tol * bnorm, abs_target,
                self.inner_attain * bnorm, 1e-300), b.dtype)
        use_df = self._use_df(b.dtype)
        if use_df:
            from ..solvers.dfloat import df_from_f64, df_to_f64

        if x0 is not None:
            x64 = x0
            r64, z64, rz, rn = self._true_res(params, u, ops_Ae, M_state,
                                              x0, b)
            resnorm = float(rn)
            if resnorm > bnorm:
                # a warm start worse than x = 0 is noise; drop it
                x64, r64 = jnp.zeros_like(b), b
                z64, rz, _ = self._start(params, u, ops_Ae, M_state, b)
                resnorm = bnorm
        else:
            x64 = jnp.zeros_like(b)
            r64 = b
            # the start program's returned norm IS ||b|| — no sync needed
            z64, rz, _ = self._start(params, u, ops_Ae, M_state, b)
            resnorm = bnorm
        it = 0
        act = 0
        best = (resnorm, x64)
        prev_true = None
        ek = est_key or label
        est = self._est.get(ek)
        first_chunk = est is not None
        trail = []  # (iters_so_far, true_resnorm) per restart boundary
        for ri in range(self.restarts + 1):
            if use_df:
                x, r, z, p = (df_from_f64(v)
                              for v in (x64, r64, z64, z64))
            else:
                x, r, z, p = x64, r64, z64, z64
            act_rs = 0  # ACTIVE iterations inside THIS Krylov space
            stall_chunks = 0
            while resnorm > float(target) and it < self.maxiter:
                if first_chunk:
                    size = self._pick_size(est)
                elif resnorm <= 100.0 * float(target):
                    # near miss: top up with the smallest chunk instead of
                    # paying a full one (a 16-trip program converging a
                    # 1.1x-over-target recurrence costs 16 matvecs, not 128)
                    size = self._SIZES[0]
                else:
                    size = self.chunk
                first_chunk = False
                run = self._chunk_prog(size, use_df)
                chunk_prev = resnorm
                x, r, z, p, rz, rn, na = run(params, u, ops_Ae, M_state,
                                             x, r, z, p, rz, target)
                resnorm = float(rn)
                it += size
                act += int(na)
                act_rs += int(na)
                if resnorm > 0.9 * chunk_prev:
                    stall_chunks += 1
                    # the RECURRENCE residual gained <10% over a whole
                    # chunk: plausibly the floating-point floor of this
                    # Krylov space (df dot-product saturation makes it
                    # plateau ABOVE target forever — at 988k dofs this
                    # burned 94 x 12.7 s chunks before any truth check).
                    # BUT a cold large solve can legitimately gain <10%
                    # over a SMALL telemetry-seeded chunk while far from
                    # its floor (round-4 verdict: this misdiagnosis is how
                    # the 988k solve returned rel_res 1.0) — declaring a
                    # floor needs a minimum of ACTIVE iterations in this
                    # space AND two consecutive no-gain chunks. Then hand
                    # progress to verification/restart + outer refinement,
                    # which measure real truth.
                    if act_rs >= 64 and stall_chunks >= 2:
                        break
                else:
                    stall_chunks = 0
            x64 = df_to_f64(x) if use_df else x
            if ri == 0 and resnorm <= float(target):
                # recurrence converged without needing a restart: skip the
                # separate verification matvec+sync — the callers' outer
                # refinement loops re-measure assembly/host-f64 truth and
                # re-enter on any recurrence lie, at the same cost the
                # verification would have had
                if resnorm < best[0]:
                    best = (resnorm, x64)
                trail.append((it, resnorm))
                break
            # recurrence test fired (or budget ran out): verify truth
            r64, z64, rz, rn = self._true_res(params, u, ops_Ae, M_state,
                                              x64, b)
            resnorm = float(rn)
            trail.append((it, resnorm))
            if resnorm < best[0]:
                best = (resnorm, x64)
            if resnorm <= float(target) or it >= self.maxiter:
                break
            # restarting only helps while the true residual still MOVES:
            # near the attainable floor each restart gains <1.3x for a
            # full chunk of iterations (measured trail: 2.8e-7 -> 2.0e-7
            # -> 1.6e-7 -> 1.8e-7), and the OUTER refinement loop owns
            # further progress against host-f64 truth at a fraction of
            # the cost — so a restart must earn a >=25% reduction to
            # keep its budget
            if prev_true is not None and resnorm > 0.75 * prev_true:
                break
            prev_true = resnorm
        resnorm, x64 = best
        rel = resnorm / bnorm
        # adapt the per-solve attainable estimate to observed behavior:
        # a stall above target raises it (stop chasing next time); a solve
        # that beats it with >3x headroom relaxes it gradually. A raise is
        # only a trustworthy attainability signal when the solve actually
        # BURNED iterations discovering the floor (a maxiter/transient
        # exit mid-progress says nothing about attainability), and it is
        # only PERSISTED after two consecutive stalled solves confirm it
        # (advisor r4: the one-way ratchet loosened targets ~20x for any
        # same-size problem, permanently).
        if rel > 1.25 * float(target) / bnorm:
            if act >= 64 and it < self.maxiter:
                raised = min(max(self.inner_attain, 0.7 * rel), 1e-5)
                if raised > self.inner_attain:
                    self._attain_raises += 1
                self.inner_attain = raised
        elif rel < 0.3 * self.inner_attain:
            self.inner_attain = max(0.7 * self.inner_attain, 1e-9)
            self._attain_raises = 0
        if (self.inner_attain <= self._attain_persist
                or self._attain_raises >= 2):
            self._attain_persist = self.inner_attain
        # converged-iteration history for the chunk-size schedule (stalled
        # solves count their full budget, pushing the estimate back up)
        prev_est = self._est.get(ek)
        self._est[ek] = act if prev_est is None else (prev_est + act + 1) // 2
        self._store_telemetry()
        # residual trail observability (round-4 verdict: nothing logged the
        # trail at scale, so the rel_res-1.0 failure mode was invisible):
        # last trail per call site, read by benchmarks/bench.py
        self.last_stats[f"trail_{ek}"] = [
            (int(i), float(f"{rn / bnorm:.3e}")) for i, rn in trail]
        if _TRACE:
            log(f"hostloop solve{label}: it={it} act={act} "
                + " ".join(f"{i}:{rn / bnorm:.1e}" for i, rn in trail)
                + f" target={float(target) / bnorm:.1e} "
                f"attain={self.inner_attain:.1e}")
        return x64, it, resnorm / bnorm

    def forward(self, params, u0, aux):
        """Newton iteration with host-chunked linear solves, continued past
        the mandated `newton_iters` as iterative refinement: each extra
        pass re-assembles the residual at the updated state (per-cell f64
        energy gradient — assembly-grade truth, below the CG matvec's
        attainable-accuracy floor) and re-solves the correction, until the
        ASSEMBLY-true relative residual meets tol, reaches the residual-
        MEASUREMENT floor eps_dev*|||A||u|+|b||| (beyond which the metric
        is cancellation noise — a direct solver measures the same value,
        tools/floor_experiment.py), or stalls. Returns
        (u, (ops_Ae, M_state)) with ops linearized at the RETURNED u."""
        if self.affine and (not self.pde.facet_forms
                            or aux[2] is not None):
            # (facet-form PDEs need the host-precomputed facet blocks in
            # aux; when a facet-relevant parameter is traced the generic
            # path below assembles them in-program instead)
            return self._forward_affine(params, u0, aux)
        pde = self.pde
        u = u0
        # warm start from the previous solve when no guess was given (see
        # _forward_affine; the refinement loop verifies truth either way)
        prev_u = getattr(self, "_last_u_gen", None)
        if prev_u is not None and not bool(jnp.any(u0)):
            u = prev_u
        # convergence is judged against the ZERO-state residual norm (the
        # load scale), NOT the first-pass residual: optimizer iterations
        # warm-start at (or near) the previous solution, whose residual is
        # the accuracy floor itself
        scale = max(float(self._res0(params)), 1e-300)
        prev = None
        best = None  # (rel, k, u, ops_Ae, M_state) — lowest true residual
        floor_abs = 0.0
        k = 0
        total = pde.newton_iters + self.refine_passes
        while True:
            u, r, ops_Ae, M_state = self._asm(params, u, aux)
            rn = float(jnp.linalg.norm(r))
            rel = rn / scale
            if best is None or rel < best[0]:
                best = (rel, k, u, ops_Ae, M_state)
            floor_abs = self.floor_c * self.eps_dev * float(
                self._floor_scale(ops_Ae, u, jnp.asarray(scale)))
            # rel <= tol exits even inside the mandated newton_iters:
            # Newton at a converged state is a no-op that only amplifies
            # the residual-floor noise (measured: warm-started evals
            # diverged to rel 1.5e9 before this guard)
            stalled = prev is not None and rel > 0.5 * prev
            if (rn <= max(self.tol * scale, floor_abs) or k >= total
                    or (k >= pde.newton_iters and stalled)):
                break
            prev = rel
            du, _, _ = self.solve_linear(
                params, u, ops_Ae, M_state, r, label=" fwd",
                abs_target=max(self.tol * scale, 0.5 * floor_abs),
                est_key=f"gfwd{min(k, 1)}")
            u = u - du
            k += 1
        rel, kb, u, ops_Ae, M_state = best
        self._last_u_gen = u
        if rel > self.warn_rel and rel * scale > 2.0 * floor_abs:
            log(f"hostloop forward: assembly-true rel_res "
                f"{rel:.2e} at pass {kb} (tol {self.tol:.1e}, floor "
                f"{floor_abs / scale:.1e}) — check conditioning/"
                "preconditioner")
        return u, (ops_Ae, M_state)

    def _forward_affine(self, params, u0, aux):
        """Linear forward with the kernel-free device program set and
        HOST-f64 truth: the authoritative solution accumulates on the host
        in native f64 (the device's float-float f64, ~2^-48, is what
        capped the round-3 nodal accuracy at 5.8e-8 vs the 1e-8 bar —
        BENCH r4a crosscheck); each refinement pass evaluates the
        assembly-true residual on the host CPU backend (33 ms at 63k) and
        solves only the SMALL correction on the device, whose float-float
        representation error then scales with the correction, not the
        solution. This is MUMPS-style mixed-precision iterative refinement
        with the roles TPU-native: device = fast low-precision solver,
        host = f64 residual oracle."""
        import numpy as np

        pde = self.pde
        f = pde.free_mask
        if not hasattr(self, "_f_np"):
            self._f_np = np.asarray(f, dtype=np.float64)
            self._bc_np = np.asarray(pde.bc_vals, dtype=np.float64)
            self._uz_np = (1.0 - self._f_np) * self._bc_np
        u, ops_Ae, M_state = self._asm_affine(params, u0, aux)
        u_np = np.asarray(u, dtype=np.float64)
        # warm start from this PDE's previous solution when the caller gave
        # no initial guess: optimizer iterations change the design ~1%, so
        # the previous solution starts the refinement at rel ~1e-2 instead
        # of 1.0 (the reference gets this implicitly from persistent
        # dolfinx Functions, SURVEY.md §5 — and FEAModel's warm start
        # cannot see concrete values under an eager jax.grad, where this
        # code runs). The refinement loop verifies against host-f64 truth,
        # so a stale guess costs one residual evaluation, never accuracy.
        fc = getattr(self, "_fwd_cache", None)
        if fc is not None and not u_np.any():
            u_np = self._f_np * fc["u_np"] + self._uz_np
            u = jnp.asarray(u_np)
        # problem scale: host-f64 residual at the BC-consistent zero state.
        # The residual VECTOR there is -(system load over free dofs): kept
        # for the adjoint's self-adjoint seed (solve_adjoint below).
        # Cached across design iterations when only the DESIGN field
        # changed and the zero state is literally zero: the affine path's
        # operator is A(theta)*u + loads(others), so r(0) = -loads(others)
        # is design-independent — recomputing it cost one host round trip
        # (~70 ms incl. sync) per optimizer iteration. Keyed by the
        # identity of every non-design leaf (objects pinned in the cache).
        dkey = getattr(pde.element_matrices_fn, "key", None)
        rzc = getattr(self, "_rz_cache", None)
        others = ([v for k, v in sorted(params.items()) if k != dkey]
                  if dkey is not None else None)
        if (rzc is not None and others is not None
                and not self._uz_np.any()
                and len(rzc[0]) == len(others)
                and all(a is b for a, b in zip(rzc[0], others))):
            scale, load_np = rzc[1], rzc[2]
        else:
            r_uz, rz = self._host_res(params, self._uz_np)
            scale = max(rz, 1e-300)
            load_np = -np.asarray(r_uz, dtype=np.float64)
            if others is not None and not self._uz_np.any():
                self._rz_cache = (list(others), scale, load_np)
        prev = None
        best = None
        k = 0
        iters = 0
        fsc = None
        total = 1 + self.refine_passes
        while True:
            r, rn = self._host_res(params, u_np)
            rel = rn / scale
            if best is None or rel < best[0]:
                best = (rel, k, u_np)
            # device/host measurement floors share the |A||u|+|b| scale;
            # measured at the first solution-scale iterate (the floor moves
            # only O(rel) per pass after that — not worth a device sync per
            # pass). At a cold-start zero state the scale degenerates to
            # ||b|| and the floors are vacuously small, so the first solve
            # proceeds and the floor is re-measured at the next pass.
            if fsc is None or (k == 1 and fsc_at_zero):
                fsc_at_zero = not u_np.any()
                fsc = float(self._floor_scale(ops_Ae, u, jnp.asarray(scale)))
            dev_floor = self.floor_c * self.eps_dev * fsc
            host_floor = self.floor_c * 2.0 ** -52 * fsc
            stalled = prev is not None and rel > 0.5 * prev
            if _TRACE:
                log(f"hostloop fwd pass {k}: rel={rel:.2e} "
                    f"host_floor={host_floor / scale:.2e} "
                    f"dev_floor={dev_floor / scale:.2e} "
                    f"fsc/scale={fsc / scale:.2e} stalled={stalled}")
            # exit margin 1.5x on the floor: a pass landing within 1.5x of
            # the measurement floor cannot be improved by a distinguishable
            # amount (the metric is cancellation noise there), and the
            # marginal extra pass costs a start+chunk+truth round trip
            # (~0.17 s/eval on the tunneled TPU)
            if (rn <= max(self.tol * scale, 1.5 * host_floor) or k >= total
                    or (k >= 1 and stalled)):
                break
            prev = rel
            # abs_target = the OUTER convergence criterion (beyond it this
            # correction has nothing left to contribute); the per-solve
            # attainable clamp lives inside solve_linear (inner_attain)
            du, it_, _ = self.solve_linear(
                params, u, ops_Ae, M_state, r, label=" fwd",
                abs_target=max(self.tol * scale, 0.5 * host_floor),
                est_key=f"fwd{min(k, 1)}", bnorm=rn)
            iters += it_
            u_np = u_np - np.asarray(du, dtype=np.float64)
            u_np = self._f_np * u_np + self._uz_np
            u = jnp.asarray(u_np)
            k += 1
        rel, kb, u_np = best
        u = jnp.asarray(u_np)
        self._fwd_cache = {"u_np": u_np, "load_np": load_np}
        # floor-scale bookkeeping for the adjoint: |||A||u||| = fsc - scale
        # (floor_scale returns norm(|A||x|) + bnorm) — the collinear-seeded
        # adjoint's floor is then |alpha|*|||A||u||| + bnorm with NO device
        # call (each floor_scale sync costs ~30-60 ms on the tunnel)
        self._fwd_fsc = None if fsc is None else (fsc, scale)
        self.last_stats.update(fwd_iters=iters, fwd_passes=k, fwd_rel=rel)
        if rel > self.warn_rel and rel * scale > 2.0 * host_floor:
            log(f"hostloop forward: host-f64-true rel_res {rel:.2e} at "
                f"pass {kb} (tol {self.tol:.1e}, floor "
                f"{host_floor / scale:.1e}) — check conditioning/"
                "preconditioner")
        return u, (ops_Ae, M_state)

    def solve_adjoint(self, params, u, ops_Ae, M_state, g):
        """A^T lam = f*g with zero rows at BC dofs; the masked operator is
        symmetric for the energy-Hessian systems this path serves, so the
        same compiled programs do the transpose solve (the reference's
        solveTranspose on the shared MUMPS factorization,
        state_operation.py:212-218). Refined like `forward`: the correction
        loop re-computes b - A^T lam through jax.vjp of the residual
        assembly until the true relative residual meets tol or stalls."""
        pde = self.pde
        b = pde.free_mask * g
        bnorm = float(jnp.linalg.norm(b))
        if bnorm == 0.0:
            return jnp.zeros_like(b)
        if self.affine:
            return self._adjoint_affine(params, u, ops_Ae, M_state, b,
                                        bnorm)
        abs_target = self.tol * bnorm
        lam, _, _ = self.solve_linear(params, u, ops_Ae, M_state, b,
                                      label=" adj", abs_target=abs_target,
                                      est_key="gadj0")
        lam = pde.free_mask * lam
        prev = None
        best = None  # (rel, k, lam) — lowest vjp-true residual
        floor_abs = 0.0
        for k in range(self.refine_passes + 1):
            r, rn = self._adj_true_res(params, u, lam, b)
            rel = float(rn) / bnorm
            if best is None or rel < best[0]:
                best = (rel, k, lam)
            # same measurement floor as the forward (A is symmetric here:
            # |A^T| = |A|), with |b| the adjoint RHS scale
            floor_abs = self.floor_c * self.eps_dev * float(
                self._floor_scale(ops_Ae, lam, jnp.asarray(bnorm)))
            stalled = prev is not None and rel > 0.5 * prev
            if (float(rn) <= max(self.tol * bnorm, floor_abs)
                    or k == self.refine_passes or stalled):
                break
            prev = rel
            dlam, _, _ = self.solve_linear(
                params, u, ops_Ae, M_state, r, label=" adj",
                abs_target=max(abs_target, 0.5 * floor_abs),
                est_key="gadj1")
            lam = pde.free_mask * (lam + dlam)
        rel, kb, lam = best
        if rel > self.warn_rel and rel * bnorm > 2.0 * floor_abs:
            log(f"hostloop adjoint: vjp-true rel_res {rel:.2e} "
                f"at pass {kb} (tol {self.tol:.1e}, floor "
                f"{floor_abs / bnorm:.1e}) — check conditioning/"
                "preconditioner")
        return lam

    def _adjoint_affine(self, params, u, ops_Ae, M_state, b, bnorm):
        """Adjoint twin of `_forward_affine`: host-f64 vjp truth, host-f64
        accumulation of lam, device correction solves (A symmetric).

        Seeding (instead of always solving from zero, which costs a full
        Krylov solve the reference's reused MUMPS factorization never
        pays): (a) when the adjoint RHS is COLLINEAR with the forward load
        — every self-adjoint objective, e.g. compliance dJ/du = F — the
        exact adjoint is alpha·u and the refinement loop usually verifies
        it at the floor with ZERO device iterations; (b) otherwise the
        previous design iteration's adjoint warm-starts the solve (the
        forward warm-starts from the previous solution the same way). Both
        seeds are verified against the host-f64 vjp truth before being
        trusted, so a wrong seed costs one residual evaluation, never
        accuracy."""
        import numpy as np

        pde = self.pde
        if not hasattr(self, "_f_np"):
            self._f_np = np.asarray(pde.free_mask, dtype=np.float64)
            self._bc_np = np.asarray(pde.bc_vals, dtype=np.float64)
            self._uz_np = (1.0 - self._f_np) * self._bc_np
        fh = self._f_np
        u_np = np.asarray(u, dtype=np.float64)
        b_np = np.asarray(b, dtype=np.float64)
        lam_np = None
        fsc = None
        fc = getattr(self, "_fwd_cache", None)
        if fc is not None:
            ln = float(np.linalg.norm(fc["load_np"]))
            if ln > 0.0:
                cos = float(fc["load_np"] @ b_np) / (ln * bnorm)
                if abs(abs(cos) - 1.0) < 1e-12:
                    alpha = (bnorm / ln) * np.sign(cos)
                    lam_np = fh * fc["u_np"] * alpha
                    ff = getattr(self, "_fwd_fsc", None)
                    if ff is not None:
                        # exact for this seed: see _forward_affine
                        fsc = abs(alpha) * max(ff[0] - ff[1], 0.0) + bnorm
                        fsc_at_zero = False
        if lam_np is None and getattr(self, "_last_lam_np", None) is not None \
                and self._last_lam_np.shape == b_np.shape:
            lam_np = self._last_lam_np
        if lam_np is None:
            lam_np = np.zeros_like(b_np)
        iters = 0
        prev = None
        best = None
        for k in range(self.refine_passes + 2):
            r, rn = self._host_adj_res(params, u_np, lam_np, b_np)
            rel = rn / bnorm
            if best is None or rel < best[0]:
                best = (rel, k, lam_np)
            if fsc is None or (k == 1 and fsc_at_zero):
                # re-measure only when pass 0 started from lam = 0 (the
                # floor scale degenerates to ||b|| there); a seeded start
                # (collinear alpha*u or the previous design's adjoint) is
                # already solution-scale — skip the device sync (~25 ms
                # on the tunneled backend)
                fsc_at_zero = not lam_np.any()
                fsc = float(self._floor_scale(
                    ops_Ae, jnp.asarray(lam_np), jnp.asarray(bnorm)))
            dev_floor = self.floor_c * self.eps_dev * fsc
            host_floor = self.floor_c * 2.0 ** -52 * fsc
            stalled = prev is not None and rel > 0.5 * prev
            if _TRACE:
                log(f"hostloop adj pass {k}: rel={rel:.2e} "
                    f"host_floor={host_floor / bnorm:.2e} stalled={stalled}")
            # 1.5x exit margin: see the forward loop
            if (rn <= max(self.tol * bnorm, 1.5 * host_floor)
                    or k > self.refine_passes or stalled):
                break
            prev = rel
            # abs_target = the OUTER criterion; per-solve attainability is
            # solve_linear's inner_attain clamp (see _forward_affine)
            dlam, it_, _ = self.solve_linear(
                params, u, ops_Ae, M_state, r, label=" adj",
                abs_target=max(self.tol * bnorm, 0.5 * host_floor),
                est_key=f"adj{min(k, 1)}", bnorm=rn)
            iters += it_
            lam_np = fh * (lam_np + np.asarray(dlam, dtype=np.float64))
        rel, kb, lam_np = best
        self._last_lam_np = lam_np
        self.last_stats.update(adj_iters=iters, adj_passes=k, adj_rel=rel)
        if rel > self.warn_rel and rel * bnorm > 2.0 * host_floor:
            log(f"hostloop adjoint: host-f64-true rel_res {rel:.2e} at "
                f"pass {kb} (tol {self.tol:.1e}, floor "
                f"{host_floor / bnorm:.1e}) — check conditioning/"
                "preconditioner")
        return jnp.asarray(lam_np)
