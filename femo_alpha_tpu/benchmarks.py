"""Benchmark workloads (shared by bench.py and tests).

Headline workload (BASELINE.md north star): static RM shell cantilever plate
forward+adjoint — one optimizer-iteration equivalent (value_and_grad of
compliance w.r.t. the thickness field) on a structured plate, matrix-free
CG via lax.custom_linear_solve, strong BCs, structured slice/pad assembly.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def build_shell_fwd_adj(nx, ny, quad_deg=2, cg_tol=1e-6, cg_maxiter=20000):
    """Returns (step_fn, thickness0, n_dofs). step_fn(thickness) ->
    (compliance, grad, cg_iters, resnorm)."""
    from .mesh import StructuredQuadMesh
    from .models.rm_shell.pde import RMShellPDE
    from .spaces import locate_dofs_geometric
    from .assembly.assemble import (
        assemble_residual,
        element_matrices,
        make_matvec,
    )
    from .assembly.bc import DirichletBC, combine_bcs, constrain_matvec
    from .solvers.krylov import cg_solve

    mesh = StructuredQuadMesh(nx, ny, (0, 0), (10.0, 2.0), gdim=3)
    pde = RMShellPDE(mesh, element_wise_material=True, inplane_deg=quad_deg,
                     shear_deg=quad_deg, stress_deg=quad_deg)
    W = pde.W
    d1 = locate_dofs_geometric(pde.V_disp, lambda x: x[:, 0] < 1e-12)
    d2 = locate_dofs_geometric(pde.V_rot, lambda x: x[:, 0] < 1e-12)
    dofs = np.concatenate([d1, d2 + pde.V_disp.n_dofs])
    free, _ = combine_bcs(W.n_dofs, [DirichletBC(dofs, 0.0)])
    form = pde.make_residual_form()
    nel = mesh.n_cells
    nn = mesh.n_nodes
    fvec = jnp.zeros(pde.VF.n_dofs).at[2::3].set(2.0)
    E_f = jnp.full(nel, 4.32e8)
    nu_f = jnp.zeros(nel)
    uhat0 = jnp.zeros(pde.VU.n_dofs)
    u0 = jnp.zeros(W.n_dofs)

    def params_of(th):
        return {"thickness": th, "E": E_f, "nu": nu_f, "uhat": uhat0,
                "F_solid": fvec}

    def solve_u(th):
        params = params_of(th)
        F = -assemble_residual(form, u0, params)  # load vector (u=0)
        b = free * F
        Ae = element_matrices(form, u0, params, chunk=8192)
        mv = constrain_matvec(make_matvec(Ae, W), free)

        it_box = {}

        def inner(op, rhs):
            x, info = cg_solve(op, rhs, tol=cg_tol, maxiter=cg_maxiter)
            it_box["info"] = info
            return x

        u = jax.lax.custom_linear_solve(mv, b, inner, symmetric=True)
        return u, F, it_box

    def compliance(th):
        u, F, _ = solve_u(th)
        return jnp.vdot(F, u)

    vg = jax.jit(jax.value_and_grad(compliance))

    @jax.jit
    def diag_fn(th):
        u, F, _ = solve_u(th)
        params = params_of(th)
        Ae = element_matrices(form, u0, params, chunk=8192)
        mv = constrain_matvec(make_matvec(Ae, W), free)
        r = free * F - mv(u)
        return jnp.linalg.norm(r) / jnp.linalg.norm(free * F), jnp.max(
            jnp.abs(u))

    th0 = jnp.full(nel, 0.2)
    return vg, diag_fn, th0, W.n_dofs


def run_shell_bench(nx=256, ny=64, repeats=3, quad_deg=2, cg_tol=1e-6,
                    verbose=True):
    """Returns dict(wall_s, n_dofs, compile_s, rel_res, tip)."""
    vg, diag_fn, th0, n_dofs = build_shell_fwd_adj(
        nx, ny, quad_deg=quad_deg, cg_tol=cg_tol)
    t0 = time.time()
    val, grad = vg(th0)
    jax.block_until_ready((val, grad))
    compile_s = time.time() - t0
    times = []
    for _ in range(repeats):
        t0 = time.time()
        val, grad = vg(th0)
        jax.block_until_ready((val, grad))
        times.append(time.time() - t0)
    rel_res, tip = diag_fn(th0)
    out = dict(
        wall_s=float(np.median(times)),
        n_dofs=int(n_dofs),
        compile_s=float(compile_s),
        rel_res=float(rel_res),
        tip=float(tip),
        compliance=float(val),
        grad_norm=float(jnp.linalg.norm(grad)),
    )
    if verbose:
        import sys

        print(
            f"[bench] shell fwd+adjoint {nx}x{ny} ({n_dofs} dofs): "
            f"median {out['wall_s']:.3f}s (compile {compile_s:.1f}s, "
            f"rel_res {out['rel_res']:.2e}, tip {out['tip']:.6e})",
            file=sys.stderr,
        )
    return out
