"""Benchmark workloads (shared by bench.py and tests).

Headline workload (BASELINE.md north star): static RM shell cantilever plate
forward+adjoint — one optimizer-iteration equivalent (objective + gradient
w.r.t. the thickness field) on a structured plate:

  assemble element matrices + load   (batched jax kernels, slice/pad layout)
  forward solve  A u = F             (Jacobi-CG, matrix-free, f64)
  adjoint solve  A lam = dJ/du       (same operator, symmetric)
  gradient       dJ/dth - lam^T dR/dth   (jax.vjp through assembly)

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


class ShellBench:
    """mode='f64': straight f64 Jacobi-CG (CPU default).
    mode='refined': f32 Jacobi-CG inner sweeps + f64 residual refinement
    (TPU default — f64 compute is emulated and the fused f64 CG loop faults
    on the experimental TPU platform plugin; mixed precision recovers f64
    residual accuracy from fast f32 sweeps)."""

    def __init__(self, nx=128, ny=32, quad_deg=2, cg_tol=1e-9,
                 cg_maxiter=100_000, mode=None, refine_passes=16,
                 inner_iters=4000):
        from .mesh import StructuredQuadMesh
        from .models.rm_shell.pde import RMShellPDE
        from .spaces import locate_dofs_geometric
        from .assembly.assemble import (
            assemble_residual,
            assemble_scalar,
            element_matrices,
            make_matvec,
        )
        from .assembly.bc import DirichletBC, combine_bcs, constrain_matvec
        from .solvers.krylov import cg_solve

        mesh = StructuredQuadMesh(nx, ny, (0, 0), (10.0, 2.0), gdim=3)
        pde = RMShellPDE(mesh, element_wise_material=True,
                         inplane_deg=quad_deg, shear_deg=quad_deg,
                         stress_deg=quad_deg)
        self.mesh, self.pde = mesh, pde
        W = pde.W
        self.n_dofs = W.n_dofs
        d1 = locate_dofs_geometric(pde.V_disp, lambda x: x[:, 0] < 1e-12)
        d2 = locate_dofs_geometric(pde.V_rot, lambda x: x[:, 0] < 1e-12)
        dofs = np.concatenate([d1, d2 + pde.V_disp.n_dofs])
        free, _ = combine_bcs(W.n_dofs, [DirichletBC(dofs, 0.0)])
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

        @jax.jit
        def asm(th):
            p = params_of(th)
            F = -assemble_residual(form, u0, p)
            Ae = element_matrices(form, u0, p, chunk=8192)
            diag = W.scatter_add(jnp.diagonal(Ae, axis1=1, axis2=2))
            diag = free * diag + (1.0 - free)
            dinv = jnp.where(diag != 0, 1.0 / diag, 1.0)
            return Ae, F, dinv

        if mode is None:
            mode = "refined" if jax.default_backend() == "tpu" else "f64"
        self.mode = mode
        if mode == "refined" and cg_tol < 1e-6:
            # f32 inner sweeps stagnate near ~1e-7 true relative residual;
            # 1e-6 is reached in roughly half the sweeps and is well below
            # discretization error for this workload
            cg_tol = 1e-6

        if mode == "f64":

            @jax.jit
            def solve(Ae, dinv, rhs):
                mv = constrain_matvec(make_matvec(Ae, W), free)
                x, info = cg_solve(mv, free * rhs, M=lambda v: dinv * v,
                                   tol=cg_tol, maxiter=cg_maxiter)
                return x, info["iters"], info["resnorm"]

        else:
            f32 = jnp.float32
            # f32 CG stagnates near ~1e-4 relative on ill-conditioned shells,
            # so ask each sweep only for 3e-4 and let the f64 outer
            # refinement accumulate the digits (host-driven: one compiled
            # inner, early exit on the true residual).

            @jax.jit
            def _residual64(Ae, x, b):
                mv64 = constrain_matvec(make_matvec(Ae, W), free)
                return b - mv64(x)

            @jax.jit
            def _inner32(Ae32, dinv32, r32):
                free32 = free.astype(f32)
                mv32 = constrain_matvec(make_matvec(Ae32, W), free32)
                dx, info = cg_solve(mv32, r32, M=lambda v: dinv32 * v,
                                    tol=3e-4, maxiter=inner_iters)
                return dx, info["iters"]

            def solve(Ae, dinv, rhs):
                b = free * rhs
                Ae32 = Ae.astype(f32)
                dinv32 = dinv.astype(f32)
                x = jnp.zeros_like(b)
                bnorm = float(jnp.linalg.norm(b))
                total_it = 0
                rel = 1.0
                for _ in range(refine_passes):
                    r = _residual64(Ae, x, b)
                    rn = float(jnp.linalg.norm(r))
                    rel = rn / max(bnorm, 1e-300)
                    if rel < cg_tol:
                        break
                    dx, it = _inner32(Ae32, dinv32, (r / rn).astype(f32))
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
        def grad_theta(u, lam, th):
            p = params_of(th)

            # -lam^T dR/dth (state-dependence of the residual)
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

        self.asm, self.solve = asm, solve
        self.objective_and_gu = objective_and_gu
        self.grad_theta = grad_theta
        self.free = free

    def forward_adjoint(self, th):
        """One optimizer-iteration equivalent. Returns dict of results."""
        Ae, F, dinv = self.asm(th)
        u, it_f, res_f = self.solve(Ae, dinv, F)
        J, gu = self.objective_and_gu(u, th)
        lam, it_a, res_a = self.solve(Ae, dinv, gu)
        g = self.grad_theta(u, lam, th)
        return dict(J=J, grad=g, u=u, iters_fwd=it_f, iters_adj=it_a,
                    res_fwd=res_f, res_adj=res_a)

    def timed_run(self, repeats=3):
        th = self.th0
        t0 = time.time()
        out = self.forward_adjoint(th)
        jax.block_until_ready((out["J"], out["grad"]))
        compile_s = time.time() - t0
        times = []
        for _ in range(repeats):
            t0 = time.time()
            out = self.forward_adjoint(th)
            jax.block_until_ready((out["J"], out["grad"]))
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
