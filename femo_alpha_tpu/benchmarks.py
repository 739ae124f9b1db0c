"""Benchmark workloads (shared by bench.py and tests).

Headline workload (BASELINE.md north star): static RM shell cantilever plate
forward+adjoint — one optimizer-iteration equivalent (objective + gradient
w.r.t. the thickness field) on a structured plate:

  assemble element matrices + load   (batched jax kernels, slice/pad layout)
  forward solve  A u = F             (MG-preconditioned CG, matrix-free)
  adjoint solve  A lam = dJ/du       (same operator, symmetric)
  gradient       dJ/dth - lam^T dR/dth   (jax.vjp through assembly)

The preconditioner is geometric multigrid over the structured hierarchy
(solvers/multigrid.py) — the TPU-native stand-in for the reference's MUMPS
factorization (SURVEY.md §2.2); `precond='jacobi'` keeps the plain
block-free Jacobi-CG path for comparison.

The adjoint is composed MANUALLY from the same staged jits (exactly the
reference's forward+transposed MUMPS flow, SURVEY.md §3.2) so each XLA
program stays small; test_bench_adjoint_matches_ad verifies it against
end-to-end jax.grad.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from .utils.timing import ensure_eager_stream, sync


class ShellBench:
    """mode='f64': straight f64 MG-CG in one fused XLA program (CPU default).
    mode='mixed' (TPU default): f64 CG on f64-assembled fine matrices,
    preconditioned by an all-f32 V-cycle, host-chunked (fixed-trip compiled
    blocks + host convergence checks — the TPU plugin faults on fused f64
    while_loops). Converges like f64 (~1e-9) at f32 preconditioner cost.
    mode='refined': f32 CG sweeps + f64 residual-assembly refinement; floor
    ~1e-4 relative with f32-assembled operators (f32 assembly noise in the
    kappa-weighted sense) — kept for speed studies.

    precond='mg' (default): geometric multigrid V-cycle; 'jacobi': point
    Jacobi (the pre-multigrid path, kept for comparison/testing)."""

    def __init__(self, nx=128, ny=32, quad_deg=2, cg_tol=1e-9,
                 cg_maxiter=100_000, mode=None, refine_passes=16,
                 inner_iters=None, precond="mg", mg_degree=6,
                 mg_lmin_ratio=0.06, coarsest_cells=256, mg_cycle="V",
                 mg_smoother="block_jacobi", affine=True, lane_major=None):
        from .mesh import StructuredQuadMesh
        from .models.rm_shell.pde import RMShellPDE
        from .spaces import locate_dofs_geometric
        from .assembly.affine import AffineDesignOperator
        from .assembly.assemble import (
            assemble_residual,
            assemble_scalar,
            element_matrices,
            make_matvec,
        )
        from .assembly.bc import DirichletBC, combine_bcs, constrain_matvec
        from .solvers.krylov import cg_solve
        from .solvers.multigrid import GeometricMG

        if mode is None:
            mode = "mixed" if jax.default_backend() == "tpu" else "f64"
        self.mode = mode
        # mixed/refined modes: the preconditioner hierarchy (incl. its fine
        # level) is built with f32 forms — genuinely single-precision
        # assembly (f32 assembly noise ~1e-4 relative in the kappa-weighted
        # sense is harmless for a PRECONDITIONER but poisons the CG
        # operator, hence:)
        #   mixed   — CG runs in f64 on f64-assembled fine matrices with the
        #             f32 V-cycle as preconditioner (one solve, no outer
        #             refinement); TPU default
        #   refined — f32 CG sweeps + f64 residual-assembly refinement
        #             (kept: fastest when the f32 floor ~1e-4 is acceptable)
        pre_dtype = jnp.float32 if mode in ("refined", "mixed") else None

        def build_level(nx_k, ny_k, dtype=pre_dtype):
            mesh_k = StructuredQuadMesh(nx_k, ny_k, (0, 0), (10.0, 2.0),
                                        gdim=3)
            pde_k = RMShellPDE(mesh_k, element_wise_material=True,
                               inplane_deg=quad_deg, shear_deg=quad_deg,
                               stress_deg=quad_deg, dtype=dtype)
            d1 = locate_dofs_geometric(pde_k.V_disp,
                                       lambda x: x[:, 0] < 1e-12)
            d2 = locate_dofs_geometric(pde_k.V_rot,
                                       lambda x: x[:, 0] < 1e-12)
            dofs_k = np.concatenate([d1, d2 + pde_k.V_disp.n_dofs])
            free_k, _ = combine_bcs(pde_k.W.n_dofs,
                                    [DirichletBC(dofs_k, 0.0)])
            return mesh_k, pde_k, free_k

        mesh, pde, free = build_level(nx, ny, dtype=None)  # f64 master
        self.mesh, self.pde = mesh, pde
        W = pde.W
        self.n_dofs = W.n_dofs
        form = pde.make_residual_form()
        obj_form = pde.compliance_form()  # ∫|u|^2 J dx + regularization
        nel = mesh.n_cells
        fvec = jnp.zeros(pde.VF.n_dofs).at[2::3].set(2.0)
        E_f = jnp.full(nel, 4.32e8)
        nu_f = jnp.zeros(nel)
        uhat0 = jnp.zeros(pde.VU.n_dofs)
        u0 = jnp.zeros(W.n_dofs)
        self.th0 = jnp.full(nel, 0.2)

        def params_of(th):
            return {"thickness": th, "E": E_f, "nu": nu_f, "uhat": uhat0,
                    "F_solid": fvec}

        self._params_of = params_of
        self.free = free
        self.precond = precond
        # affine design decomposition: DG0 thickness enters the stiffness
        # polynomially (Ae = h*M1 + h^3*M3, MID plane), so extract the basis
        # once and make per-iteration re-assembly two elementwise AXPYs (see
        # assembly/affine.py). Exact — verified in tests/test_affine.py.
        self.affine = bool(affine)
        # lane-major element-matrix layout (nd, nd, nc): pad-free on TPU
        # (the (nc, 39, 39) layout pads 39 -> 128 lanes, ~3.3x HBM traffic),
        # but cell-major is the cache-friendly layout on CPU — so the
        # default is backend-dependent. Rides the affine path: every level's
        # Ae then comes from an affine combine that emits lane-major
        # directly.
        if lane_major is None:
            lane_major = jax.default_backend() == "tpu"
        lane = self.affine and bool(lane_major)
        self.lane_major = lane
        from .assembly.assemble import make_matvec_T

        aff64 = None
        if self.affine:
            # powers=(1,3) is exact only for MID reference plane + DG0
            # thickness (h and h^3 enter the CLT polynomially per cell)
            assert pde.bot_plane is False and pde.element_wise_material, (
                "affine=True requires MID plane + element-wise thickness")
            aff64 = AffineDesignOperator(
                form, u0, params_of, key="thickness", powers=(1, 3),
                probe_scale=0.2, chunk=8192,
                layout="lane" if lane else "cells")
        self._aff64 = aff64

        def constrained_mv(Ae, space, free_mask):
            mv = make_matvec_T(Ae, space) if lane else make_matvec(Ae, space)
            return constrain_matvec(mv, free_mask)

        def affine_level_op(pde_k, dtype):
            """Per-level affine basis in `dtype` (the MG hierarchy)."""
            form_k = pde_k.make_residual_form()
            u0_k = jnp.zeros(pde_k.W.n_dofs)
            nel_k = pde_k.mesh.n_cells

            def params_of_k(th_k):
                return {"thickness": th_k,
                        "E": jnp.full(nel_k, 4.32e8),
                        "nu": jnp.zeros(nel_k),
                        "uhat": jnp.zeros(pde_k.VU.n_dofs),
                        "F_solid": jnp.zeros(pde_k.VF.n_dofs)}

            return AffineDesignOperator(
                form_k, u0_k, params_of_k, key="thickness", powers=(1, 3),
                probe_scale=0.2, chunk=8192, dtype=dtype,
                layout="lane" if lane else "cells")

        mg = None
        form32 = None
        mg_bases = []
        if precond == "mg":
            levels = []
            nx_k, ny_k = nx, ny
            if pre_dtype is None:
                pde_k, free_k = pde, free
            else:
                _, pde_k, free_k = build_level(nx, ny)
            first_level = True
            while True:
                lev = {"space": pde_k.W, "free": free_k}
                form_k = pde_k.make_residual_form()
                u0_k = jnp.zeros(pde_k.W.n_dofs)

                if self.affine:
                    if first_level:
                        # fine level: reuse the f64 basis, cast (one assembly
                        # instead of two)
                        aff_k = (aff64.astype(pre_dtype)
                                 if pre_dtype is not None else aff64)
                    else:
                        aff_k = affine_level_op(pde_k, pre_dtype)
                    mg_bases.append(aff_k.basis)

                    # basis arrives via p["_affine_basis"] (runtime arg
                    # threaded by GeometricMG.setup/setup_staged) — closing
                    # over aff_k.basis would embed it as a program constant
                    def make_Ae(p, aff_k=aff_k):
                        return aff_k.element_matrices(
                            p["thickness"], basis=p.get("_affine_basis"))
                else:

                    def make_Ae(p, form_k=form_k, u0_k=u0_k):
                        return element_matrices(form_k, u0_k, p, chunk=8192)

                first_level = False
                lev["make_Ae"] = make_Ae
                can_coarsen = (
                    nx_k % 2 == 0 and ny_k % 2 == 0
                    and (nx_k // 2) * (ny_k // 2) >= coarsest_cells
                )
                if can_coarsen:
                    nVFc = ((nx_k // 2) + 1) * ((ny_k // 2) + 1) * 3

                    def coarsen(p, nx_k=nx_k, ny_k=ny_k, nVFc=nVFc):
                        def c0(a):
                            return a.reshape(
                                nx_k // 2, 2, ny_k // 2, 2).mean(axis=(1, 3)
                                                                 ).reshape(-1)

                        uh = p["uhat"].reshape(nx_k + 1, ny_k + 1, 3)[
                            ::2, ::2].reshape(-1)
                        return {"thickness": c0(p["thickness"]),
                                "E": c0(p["E"]), "nu": c0(p["nu"]),
                                "uhat": uh,
                                "F_solid": jnp.zeros(nVFc, p["F_solid"].dtype)}

                    lev["coarsen"] = coarsen
                levels.append(lev)
                if not can_coarsen:
                    break
                nx_k, ny_k = nx_k // 2, ny_k // 2
                _, pde_k, free_k = build_level(nx_k, ny_k)
            mg = GeometricMG(levels, constrained_mv, degree=mg_degree,
                             lmin_ratio=mg_lmin_ratio, cycle=mg_cycle,
                             smoother=mg_smoother, lane_major=lane)
        elif pre_dtype is not None:
            _, pde32, _ = build_level(nx, ny)
            form32 = pde32.make_residual_form()
        self.mg = mg
        # per-level affine bases + the f64 fine basis: passed to every jit
        # as ARGUMENTS (program constants would be constant-folded at
        # compile time and bloat every cache entry by ~100MB)
        mg_bases = tuple(mg_bases) if (self.affine and mg_bases) else None
        self._mg_bases = mg_bases
        basis64 = aff64.basis if aff64 is not None else None
        self._basis64 = basis64

        # the load vector is independent of the design (R(0) = -load: all
        # strain-energy gradients vanish at u=0) — assembled once (one
        # jitted dispatch; eager assembly would compile op-by-op at setup)
        F_load = jax.jit(
            lambda: -assemble_residual(form, u0, params_of(self.th0)))()
        self._F_load = F_load

        @jax.jit
        def _load_and_Ae64(th, b64):
            p = params_of(th)
            if aff64 is not None:
                return F_load, aff64.element_matrices(th, basis=b64)
            F = -assemble_residual(form, u0, p)
            Ae64 = element_matrices(form, u0, p, chunk=8192)
            return F, Ae64

        def asm_mixed(th):
            # host-composed: per-level jits (setup_staged) compile several
            # times faster than one fused setup program
            F, Ae64 = _load_and_Ae64(th, basis64)
            p = params_of(th)
            if mg is not None:
                state = mg.setup_staged(p, dtype=jnp.float32,
                                        bases=mg_bases)
            else:
                dg = (jnp.diagonal(Ae64, axis1=0, axis2=1) if lane
                      else jnp.diagonal(Ae64, axis1=1, axis2=2))
                diag = W.scatter_add(dg)
                diag = free * diag + (1.0 - free)
                state = {"Ae": [],
                         "dinv": jnp.where(diag != 0, 1.0 / diag, 1.0)}
            state["Ae_f"] = Ae64
            state["F"] = F
            return state, F

        @jax.jit
        def asm(th, b64, bases_k):
            p = params_of(th)
            F = F_load if aff64 is not None else -assemble_residual(
                form, u0, p)  # f64 (load vector)
            if mode == "refined":
                # the entire preconditioner state is f32 (f32 forms); the
                # f64 outer-refinement residual is later computed by one f64
                # residual ASSEMBLY per pass — no f64 element matrices at all
                # (f64 is emulated on TPU: they cost ~100x in compile time)
                if mg is not None:
                    state = mg.setup(p, dtype=jnp.float32, bases=bases_k)
                else:
                    p32 = jax.tree.map(
                        lambda a: a.astype(jnp.float32)
                        if jnp.issubdtype(a.dtype, jnp.floating) else a, p)
                    Ae = element_matrices(form32, jnp.zeros(
                        W.n_dofs, jnp.float32), p32, chunk=8192)
                    diag = W.scatter_add(
                        jnp.diagonal(Ae, axis1=1, axis2=2))
                    if lane:
                        # constrained_mv routes lane-major through
                        # make_matvec_T, which expects (nd, nd, nc)
                        Ae = jnp.moveaxis(Ae, 0, -1)
                    f32m = free.astype(jnp.float32)
                    diag = f32m * diag + (1.0 - f32m)
                    dinv = jnp.where(diag != 0, 1.0 / diag, 1.0)
                    state = {"Ae": [Ae], "dinv": dinv}
                state["th"] = th
            else:
                Ae = (aff64.element_matrices(th, basis=b64)
                      if aff64 is not None
                      else element_matrices(form, u0, p, chunk=8192))
                if mg is not None:
                    state = mg.setup(p, Ae0=Ae, bases=bases_k)
                else:
                    dg = (jnp.diagonal(Ae, axis1=0, axis2=1) if lane
                          else jnp.diagonal(Ae, axis1=1, axis2=2))
                    diag = W.scatter_add(dg)
                    diag = free * diag + (1.0 - free)
                    dinv = jnp.where(diag != 0, 1.0 / diag, 1.0)
                    state = {"Ae": [Ae], "dinv": dinv}
            state["F"] = F
            return state, F

        def mv_and_M(state, dtype):
            free_t = free.astype(dtype)
            mv = constrained_mv(state["Ae"][0], W, free_t)
            if mg is not None:
                M = lambda v: mg.apply(state, v)  # noqa: E731
            else:
                dinv = state["dinv"]
                M = lambda v: dinv * v  # noqa: E731
            return mv, M

        if mode == "refined" and cg_tol < 1e-6:
            # f32 inner sweeps stagnate near ~1e-7 true relative residual;
            # 1e-6 is reached in roughly half the sweeps and is well below
            # discretization error for this workload
            cg_tol = 1e-6
        if inner_iters is None:
            inner_iters = 300 if precond == "mg" else 4000

        if mode == "f64":

            @jax.jit
            def solve(state, rhs):
                mv, M = mv_and_M(state, rhs.dtype)
                x, info = cg_solve(mv, free * rhs, M=M,
                                   tol=cg_tol, maxiter=cg_maxiter)
                return x, info["iters"], info["resnorm"]

        elif mode == "mixed":
            # f64 CG on f64 fine matrices with the f32 V-cycle as
            # preconditioner. Host-chunked: the TPU platform plugin faults
            # on fused f64 while_loops at larger sizes, so we run compiled
            # fixed-trip blocks with host convergence checks
            # (cg_chunk_iterations) instead of one lax.while_loop.
            from .solvers.krylov import cg_chunk_iterations

            f32 = jnp.float32
            CHUNK = 32

            def _mv_M(state):
                mv = constrained_mv(state["Ae_f"], W, free)
                if mg is not None:
                    M = lambda v: mg.apply(  # noqa: E731
                        state, v.astype(f32)).astype(v.dtype)
                else:
                    M = lambda v: state["dinv"] * v  # noqa: E731
                return mv, M

            @jax.jit
            def _cg_start(state, b):
                mv, M = _mv_M(state)
                r = b - mv(jnp.zeros_like(b))
                z = M(r)
                return r, z, z, jnp.vdot(r, z), jnp.linalg.norm(r)

            @jax.jit
            def _cg_chunk(state, x, r, z, p, rz, target):
                mv, M = _mv_M(state)
                return cg_chunk_iterations(mv, M, CHUNK, x, r, z, p, rz,
                                           target)

            def solve(state, rhs):
                b = free * rhs
                bnorm = float(jnp.linalg.norm(b))
                target = jnp.asarray(max(cg_tol * bnorm, 1e-300), b.dtype)
                x = jnp.zeros_like(b)
                r, z, p, rz, rn = _cg_start(state, b)
                it, resnorm = 0, float(rn)
                while resnorm > float(target) and it < cg_maxiter:
                    x, r, z, p, rz, rn = _cg_chunk(state, x, r, z, p, rz,
                                                   target)
                    resnorm = float(rn)
                    it += CHUNK
                return (x, jnp.asarray(it),
                        jnp.asarray(resnorm / max(bnorm, 1e-300)))

        else:
            f32 = jnp.float32
            # f32 CG stagnates near ~1e-4 relative on ill-conditioned shells,
            # so ask each sweep only for 3e-4 and let the f64 outer
            # refinement accumulate the digits (host-driven: one compiled
            # inner, early exit on the true residual).

            @jax.jit
            def _residual64(th, x, b, F):
                # A x = R(x) - R(0) = R(x) + F for the linear problem, so
                # the true f64 residual comes from one residual ASSEMBLY —
                # the staged equivalent of the reference's r = b - A x with
                # MUMPS-held A (SURVEY.md §3.2), but without ever forming
                # f64 element matrices on the TPU
                p = params_of(th)
                return free * (b - assemble_residual(form, x, p) - F)

            @jax.jit
            def _inner32(state, r32):
                mv, M = mv_and_M(state, f32)
                dx, info = cg_solve(mv, r32, M=M, tol=3e-4,
                                    maxiter=inner_iters)
                return dx, info["iters"]

            def solve(state, rhs):
                # state's preconditioner part is f32 by construction
                b = free * rhs
                x = jnp.zeros_like(b)
                bnorm = float(jnp.linalg.norm(b))
                total_it = 0
                rel = 1.0
                for _ in range(refine_passes):
                    r = _residual64(state["th"], x, b, state["F"])
                    rn = float(jnp.linalg.norm(r))
                    rel = rn / max(bnorm, 1e-300)
                    if rel < cg_tol:
                        break
                    dx, it = _inner32(state, (r / rn).astype(f32))
                    x = x + dx.astype(b.dtype) * rn
                    total_it += int(it)
                return x, jnp.array(total_it), jnp.array(rel)

        @jax.jit
        def objective_and_gu(u, th):
            p = {"thickness": th, "uhat": uhat0}

            def J(u):
                return assemble_scalar(obj_form, u, p)

            val, gu = jax.value_and_grad(J)(u)
            return val, gu

        @jax.jit
        def grad_theta(u, lam, th, b64):
            p = params_of(th)

            # -lam^T dR/dth (state-dependence of the residual)
            if aff64 is not None:
                # closed form: R = A(th) u - F with F design-independent
                g_r = aff64.vjp_theta(th, u, lam, W, basis=b64)
            else:

                def r_of_th(th_):
                    p2 = params_of(th_)
                    return assemble_residual(form, u, p2)

                _, vjp = jax.vjp(r_of_th, th)
                (g_r,) = vjp(lam)

            # + dJ/dth direct (regularization term of the compliance)
            def J_of_th(th_):
                return assemble_scalar(obj_form, u,
                                       {"thickness": th_, "uhat": uhat0})

            g_j = jax.grad(J_of_th)(th)
            return g_j - g_r

        self.asm = (asm_mixed if mode == "mixed"
                    else (lambda th: asm(th, basis64, mg_bases)))
        self.solve = solve
        self.objective_and_gu = objective_and_gu
        self.grad_theta = lambda u, lam, th: grad_theta(u, lam, th, basis64)

    def forward_adjoint(self, th):
        """One optimizer-iteration equivalent. Returns dict of results."""
        state, F = self.asm(th)
        u, it_f, res_f = self.solve(state, F)
        J, gu = self.objective_and_gu(u, th)
        lam, it_a, res_a = self.solve(state, gu)
        g = self.grad_theta(u, lam, th)
        return dict(J=J, grad=g, u=u, iters_fwd=it_f, iters_adj=it_a,
                    res_fwd=res_f, res_adj=res_a)

    def timed_run(self, repeats=3):
        th = self.th0
        t0 = time.time()
        out = self.forward_adjoint(th)
        sync((out["J"], out["grad"]))
        compile_s = time.time() - t0
        times = []
        for _ in range(repeats):
            t0 = time.time()
            out = self.forward_adjoint(th)
            sync((out["J"], out["grad"]))
            times.append(time.time() - t0)
        tip = float(jnp.max(jnp.abs(out["u"])))
        return dict(
            wall_s=float(np.median(times)),
            compile_s=float(compile_s),
            n_dofs=int(self.n_dofs),
            iters_fwd=int(out["iters_fwd"]),
            iters_adj=int(out["iters_adj"]),
            res_fwd=float(out["res_fwd"]),
            res_adj=float(out["res_adj"]),
            tip=tip,
            J=float(out["J"]),
            grad_norm=float(jnp.linalg.norm(out["grad"])),
        )


class LibraryBench:
    """The PRODUCT surface: `RMShellModel.evaluate` + `jax.grad`, on the
    same north-star workload as ShellBench (structured cantilever plate,
    compliance + exact thickness gradient). Since round 2 the library path
    runs the staged custom_vjp pipeline (adjoint/implicit.py): persistent
    jitted fwd/bwd programs, affine design re-assembly, geometric-MG
    preconditioner state shared between forward and adjoint — so what users
    get from the documented API is the benchmark, not a hand-staged twin.
    """

    def __init__(self, nx=128, ny=32, penalty=False):
        from .mesh import createRectangleMesh
        from .models import RMShellModel

        mesh = createRectangleMesh(nx, ny, (0, 0), (10.0, 2.0), "quad",
                                   gdim=3)
        # penalty=False (bench default): strong-BC elimination -> the
        # geometric-MG solve path, the north-star structured workload
        # (matches ShellBench; the reference supports both BC modes,
        # rm_shell_model.py:168-180). penalty=True exercises the
        # reference-default penalty facets -> RCM band Cholesky path
        # (benchmarked on the unstructured wing by tools/wing_bench.py).
        self.model = RMShellModel(
            mesh, shell_bc_func=lambda x: x[:, 0] < 1e-12,
            element_wise_material=True, PENALTY_BC=penalty)
        self.n_dofs = self.model.shell_pde.W.n_dofs
        nel, nn = mesh.n_cells, mesh.n_nodes
        self.f = jnp.zeros(3 * nn).at[2::3].set(2.0)
        self.E = jnp.full(nel, 4.32e8)
        self.nu = jnp.zeros(nel)
        self.rho = jnp.full(nel, 100.0)
        self.th0 = jnp.full(nel, 0.2)

        def J(th):
            out = self.model.evaluate(self.f, th, self.E, self.nu, self.rho,
                                      is_pressure=True)
            return out.compliance, out.disp_solid

        # the documented fast path: on the hostloop (TPU) path the
        # evaluate+grad pipeline is staged into TWO persistent jitted
        # programs around the host-driven solves (probe + postgrad,
        # fea/pipeline.py stage_value_and_grad); elsewhere it is one fused
        # jitted program (compile_pipeline fallback). Aux (affine/MG
        # bases) and quadratic-output coefficients ride through the jit
        # boundaries as runtime args either way.
        from .fea.pipeline import stage_value_and_grad

        self._vg = stage_value_and_grad(J, (self.th0,), has_aux=True)

    def forward_adjoint(self, th):
        (val, u), g = self._vg(th)
        return dict(J=val, grad=g, u=u)

    def timed_run(self, repeats=3):
        th = self.th0
        t0 = time.time()
        out = self.forward_adjoint(th)
        sync((out["J"], out["grad"]))
        compile_s = time.time() - t0
        times = []
        for i in range(repeats):
            # a NEW design point each repeat: the workload is one optimizer
            # iteration (solve warm-started from the previous design's
            # solution, as the SLSQP loop does) — repeating an identical
            # design would let warm-start detection skip the solve
            th = self.th0 * (1.0 + 0.01 * (i + 1))
            t0 = time.time()
            out = self.forward_adjoint(th)
            sync((out["J"], out["grad"]))
            times.append(time.time() - t0)
        # quality/golden values at the NOMINAL design (untimed): tip and J
        # stay comparable across rounds, and the rel_res is measured at the
        # state the warm-started solve actually returns
        th = self.th0
        out = self.forward_adjoint(th)
        sync((out["J"], out["grad"]))
        # solve quality: constrained-residual norm at the returned state
        # relative to the zero-state residual (= the RHS for this linear
        # problem) — one jitted program, not timed
        op = self.model.fea.states["disp_solid"].pde
        params = {"thickness": th, "E": self.E, "nu": self.nu,
                  "uhat": jnp.zeros_like(self.f), "F_solid": self.f}
        emf = op.element_matrices_fn
        basis = (emf.prepare(params)
                 if emf is not None and hasattr(emf, "prepare") else None)
        u0 = jnp.zeros(op.n_dofs)

        from .utils.offload import run_setup
        from .utils.quality import make_abs_matvec

        amv = make_abs_matvec(op)

        def _rel(u, th_, basis_):
            p = dict(params)
            p["thickness"] = th_
            rn = jnp.linalg.norm(op.residual(u, p))
            r0 = jnp.linalg.norm(op.residual(u0, p))
            # residual-MEASUREMENT floor scale |||A||u|+|b||| / ||b||: the
            # relative residual saturates at ~eps times this value for
            # ANY backward-stable solver (incl. the reference's MUMPS) —
            # utils/quality.py, tools/floor_experiment.py
            ops = op._assemble_ops(u0, p, emf_basis=basis_)
            fl = jnp.linalg.norm(amv(ops, u)) + r0
            return rn / r0, fl / r0

        # quality measurement runs on the host CPU backend in NATIVE f64:
        # (a) the per-cell residual kernel never remote-compiles on the
        # tunneled TPU (~100+ s, measurement-only), (b) the truth is
        # measured in the best arithmetic available — the same oracle the
        # hostloop refinement targets (adjoint/hostloop.py host passes)
        rel_, floor_ = run_setup(jax.jit(_rel), out["u"], th, basis)
        rel = float(rel_)
        res_floor = float(np.finfo(np.float64).eps) * float(floor_)
        tip = float(jnp.max(jnp.abs(out["u"])))
        # the converged state at the nominal design, for external
        # cross-checks (bench.py's host-SuperLU nodal comparison)
        self.last_u = np.asarray(out["u"], dtype=np.float64)
        # assembly throughput: the per-design-iteration element re-assembly
        # (affine AXPY combine when available, else full element_matrices) —
        # the BASELINE.md "assembly MDOF/s" metric. Basis passed as a runtime
        # arg (embedding it as a jit constant would be constant-folded per
        # compile; see commit 6cd00a4).

        @jax.jit
        def _asm(th_, basis_):
            p = dict(params)
            p["thickness"] = th_
            return op._assemble_ops(u0, p, emf_basis=basis_)

        # amortized over a pipeline of async dispatches: a single
        # dispatch+sync over the tunneled TPU has a ~20-40 ms round-trip
        # LATENCY floor that swamps the ~ms-scale compute at 63k dofs
        # (measured: 48-65 ms "assembly" that is >90% tunnel sync). The
        # optimizer-iteration workload dispatches assembly as part of a
        # longer program stream, so throughput — distinct designs, queued
        # back-to-back, one sync — is the honest metric; the one-shot
        # latency is reported alongside.
        sync(_asm(th, basis))
        t0 = time.time()
        sync(_asm(th, basis))
        assembly_lat_s = time.time() - t0
        reps = 8
        ths = [th * (1.0 + 1e-4 * (j + 1)) for j in range(reps)]
        t0 = time.time()
        outs = [_asm(t_, basis) for t_ in ths]
        sync(outs)
        assembly_stream_s = (time.time() - t0) / reps
        del outs
        assembly_s = assembly_stream_s
        if self.n_dofs <= 200_000:
            # sustained KERNEL throughput: the same `reps` distinct designs
            # assembled by ONE batched program (vmap over the design axis —
            # one dispatch). Queued per-design dispatches pay the tunneled
            # backend's ~5 ms per-dispatch floor EACH, which at 63k dofs
            # swamps the ~3 ms combine (at 988k the same kernel measures
            # 20+ MDOF/s per-dispatch because compute dominates); a
            # line-search over candidate designs batches exactly like
            # this. Gated by size: the batched output is reps x the
            # element-matrix block (~400 MB at 63k, ~6 GB at 988k).
            @jax.jit
            def _asm_b(ths_, basis_):
                def one(t_):
                    p = dict(params)
                    p["thickness"] = t_
                    return op._assemble_ops(u0, p, emf_basis=basis_)

                return jax.vmap(one)(ths_)

            thsb = jnp.stack(ths)
            try:
                sync(_asm_b(thsb, basis))
                # 3 batched dispatches, pipelined, one sync: a single
                # dispatch can eat a tunnel-latency spike (measured 61 ms
                # vs 22 ms steady for the same program)
                t0 = time.time()
                obs = [_asm_b(thsb, basis) for _ in range(3)]
                sync(obs)
                batched_s = (time.time() - t0) / (3 * reps)
                del obs
                # sustained = the better measurement mode: batched wins
                # on the tunneled TPU (amortizes the dispatch floor),
                # streamed wins on CPU (serial core, no floor to hide)
                assembly_s = min(batched_s, assembly_stream_s)
            except Exception as e:  # noqa: BLE001 — fall back to stream
                print(f"[bench] batched assembly failed ({e}); "
                      "reporting streamed", flush=True)
        hs = getattr(getattr(op, "_hostloop", None), "last_stats", {}) or {}
        import json as _json

        return dict(
            wall_s=float(np.median(times)),
            compile_s=float(compile_s),
            n_dofs=int(self.n_dofs),
            iters_fwd=int(hs.get("fwd_iters", -1)),
            iters_adj=int(hs.get("adj_iters", -1)),
            # full solver telemetry (passes, per-stage rel, residual
            # trails) as a JSON string: survives the child-process
            # int/float/str filter in bench.py, so scale-point failures
            # are diagnosable from the bench stderr/JSON alone (round-4
            # verdict: the rel_res-1.0 failure mode was invisible)
            solver_stats=_json.dumps(hs, default=str),
            res_fwd=rel, res_adj=rel,
            res_floor=float(res_floor),
            tip=tip,
            J=float(out["J"]),
            grad_norm=float(jnp.linalg.norm(out["grad"])),
            assembly_s=float(assembly_s),
            assembly_latency_s=float(assembly_lat_s),
            assembly_stream_s=float(assembly_stream_s),
            assembly_mdof_s=float(self.n_dofs / max(assembly_s, 1e-12) / 1e6),
            assembly_stream_mdof_s=float(
                self.n_dofs / max(assembly_stream_s, 1e-12) / 1e6),
        )
