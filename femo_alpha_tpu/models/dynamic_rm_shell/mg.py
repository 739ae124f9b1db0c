"""Geometric multigrid for the transient shell step operator.

The implicit-midpoint step solves  A w = b  with A = (2/dt^2) M + K/2
(plate_sim.simulate; reference: dolfinx NewtonSolver with MUMPS LU per step,
plate_sim.py:281-361 / nonlinear_utils.py:210-233).  A is shell-stiffness-
dominated at practical dt, so Jacobi-PCG needs thousands of iterations —
this builds the same nested structured hierarchy as models/rm_shell/mg.py
but with per-level element matrices  (2/dt^2) Me_k + Ke_k / 2, giving a
V-cycle preconditioner that brings the per-step fixed-trip CG to a few
dozen iterations (TPU-safe: no while_loop, no f64 factorization).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...assembly.assemble import element_matrices, make_matvec
from ...assembly.bc import DirichletBC, combine_bcs, constrain_matvec
from ...solvers.multigrid import GeometricMG
from ...spaces import locate_dofs_geometric
from ..rm_shell.mg import _field_coarsener


def build_platesim_mg(sim, coarsest_cells=64, dtype=None, degree=6,
                      lmin_ratio=0.06, asm_chunk=8192):
    """GeometricMG for a PlateSim's step operator, or None if the mesh is
    not a coarsenable StructuredQuadMesh.

    Level params: {"thickness": t_k} (E/nu/rho/dt are fixed PlateSim
    attributes, baked per level)."""
    from ..rm_shell.pde import RMShellPDE

    mesh = sim.mesh
    if not getattr(mesh, "structured", False):
        return None
    c = np.asarray(mesh.coords)
    p0 = (float(c[:, 0].min()), float(c[:, 1].min()))
    p1 = (float(c[:, 0].max()), float(c[:, 1].max()))

    def can_coarsen(nx_k, ny_k):
        return (nx_k % 2 == 0 and ny_k % 2 == 0
                and (nx_k // 2) * (ny_k // 2) >= coarsest_cells)

    if not can_coarsen(mesh.nx, mesh.ny):
        return None

    two_dt2 = 2.0 / sim.dt**2

    def build_level(nx_k, ny_k):
        from ...mesh import StructuredQuadMesh

        mesh_k = StructuredQuadMesh(nx_k, ny_k, p0, p1, gdim=mesh.gdim)
        pde_k = RMShellPDE(
            mesh_k,
            element_wise_material=sim.element_wise_thickness,
            element_type="CG2CG1",
            inplane_deg=sim.quad_deg,
            shear_deg=sim.quad_deg,
            stress_deg=sim.quad_deg,
            dtype=dtype,
        )
        d1 = locate_dofs_geometric(pde_k.V_disp, sim.bc_func)
        d2 = locate_dofs_geometric(pde_k.V_rot, sim.bc_func)
        dofs = np.concatenate([d1, d2 + pde_k.V_disp.n_dofs])
        free_k, _ = combine_bcs(pde_k.W.n_dofs, [DirichletBC(dofs, 0.0)])
        return pde_k, free_k

    levels = []
    nx_k, ny_k = mesh.nx, mesh.ny
    pde_k, free_k = build_level(nx_k, ny_k)
    while True:
        K_form_k = pde_k.elastic_energy_form()
        M_form_k = pde_k.inertia_form(rho_is_param=False)
        u0_k = jnp.zeros(pde_k.W.n_dofs, dtype=dtype)
        nT_k = pde_k.VT.n_dofs
        E_k = jnp.full(nT_k, float(sim.E), dtype=dtype)
        nu_k = jnp.full(nT_k, float(sim.nu), dtype=dtype)
        uhat_k = jnp.zeros(pde_k.VU.n_dofs, dtype=dtype)
        rho_k = jnp.asarray(float(sim.rho),
                            dtype=dtype or jnp.zeros(()).dtype)
        lev = {"space": pde_k.W, "free": free_k}

        def make_Ae(p, K_form_k=K_form_k, M_form_k=M_form_k, u0_k=u0_k,
                    E_k=E_k, nu_k=nu_k, uhat_k=uhat_k, rho_k=rho_k):
            t = p["thickness"].astype(u0_k.dtype)
            Ke = element_matrices(
                K_form_k, u0_k,
                {"thickness": t, "E": E_k, "nu": nu_k, "uhat": uhat_k},
                chunk=asm_chunk)
            Me = element_matrices(
                M_form_k, u0_k, {"thickness": t, "rho": rho_k},
                chunk=asm_chunk)
            return two_dt2 * Me + 0.5 * Ke

        lev["make_Ae"] = make_Ae
        if can_coarsen(nx_k, ny_k):
            cT = _field_coarsener(pde_k.VT, nx_k, ny_k)

            def coarsen(p, cT=cT):
                return {"thickness": cT(p["thickness"])}

            lev["coarsen"] = coarsen
            levels.append(lev)
            nx_k, ny_k = nx_k // 2, ny_k // 2
            pde_k, free_k = build_level(nx_k, ny_k)
        else:
            levels.append(lev)
            break

    def constrained_mv(Ae, space, free_mask):
        return constrain_matvec(make_matvec(Ae, space), free_mask)

    return GeometricMG(levels, constrained_mv, degree=degree,
                       lmin_ratio=lmin_ratio)
