"""Geometric-multigrid hierarchy builder for RM shells on structured meshes.

Bridges the shell model to solvers/multigrid.py: re-discretizes the shell
PDE on a nested StructuredQuadMesh hierarchy (same element/quadrature
options), coarsens the parameter fields by space kind (DG0 cell means, CG1
vertex injection), and returns a GeometricMG whose setup() can run inside
the jitted solve of ImplicitPDE (precond_factory hook).

This is what replaces MUMPS factorization (SURVEY.md §2.2) at the scale
where dense direct solves stop fitting, for the strong-BC shell path.
(Penalty BCs deliberately keep Jacobi/dense: beta = 1e15/h_E facet terms
poison smoothing-based preconditioners, SURVEY.md §7.3.)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...assembly.assemble import element_matrices, make_matvec, make_matvec_T
from ...assembly.bc import DirichletBC, combine_bcs, constrain_matvec
from ...solvers.multigrid import GeometricMG
from ...spaces import locate_dofs_geometric


def _coarsen_dg0(a, nx, ny, vs):
    return a.reshape(nx // 2, 2, ny // 2, 2, vs).mean(axis=(1, 3)).reshape(-1)


def _coarsen_cg1(a, nx, ny, vs):
    return a.reshape(nx + 1, ny + 1, vs)[::2, ::2].reshape(-1)


def _field_coarsener(space, nx, ny):
    vs = space.value_size
    if space.family == "DG" and space.degree == 0:
        return lambda a: _coarsen_dg0(a, nx, ny, vs)
    if space.degree == 1:
        return lambda a: _coarsen_cg1(a, nx, ny, vs)
    raise ValueError(f"no coarsener for {space.family}{space.degree}")


def build_shell_mg(pde, bc_func, coarsest_cells=256, dtype=None,
                   degree=6, lmin_ratio=0.06, asm_chunk=8192, affine=None,
                   lane_major=False):
    """GeometricMG for an RMShellPDE on a StructuredQuadMesh, or None when
    the mesh cannot be coarsened at least once (odd dims / already small).

    dtype: precision of the hierarchy's forms/state (f32 on TPU — the
    preconditioner does not need f64 and f64 is emulated there).
    affine: per-level affine design re-assembly (h*M1 + h^3*M3, two AXPYs
    per setup instead of a full assembly per level; assembly/affine.py) —
    defaults to on whenever the decomposition is exact (elementwise
    thickness, MID plane, no composite).
    lane_major: every level's element matrices live in the (nd, nd, nc)
    pad-free TPU layout — matvecs/smoothers run through make_matvec_T and
    the Pallas cell kernel (cell-major pads nd=39 -> 128 lanes, ~3.3x HBM
    traffic per V-cycle sweep on TPU). Requires the affine path (each
    level's Ae comes from a lane-emitting affine combine)."""
    from .pde import RMShellPDE

    mesh = pde.mesh
    if not getattr(mesh, "structured", False):
        return None
    c = np.asarray(mesh.coords)
    p0 = (float(c[:, 0].min()), float(c[:, 1].min()))
    p1 = (float(c[:, 0].max()), float(c[:, 1].max()))

    def build_level(nx_k, ny_k, composite_k):
        from ...mesh import StructuredQuadMesh

        mesh_k = StructuredQuadMesh(nx_k, ny_k, p0, p1, gdim=mesh.gdim)
        pde_k = RMShellPDE(
            mesh_k,
            element_wise_material=pde.element_wise_material,
            elementwise_pressure=pde.elementwise_pressure,
            element_type=pde.element_type,
            inplane_deg=pde.inplane_deg,
            shear_deg=pde.shear_deg,
            bot_plane=pde.bot_plane,
            dtype=dtype,
            composite=composite_k,
        )
        d1 = locate_dofs_geometric(pde_k.V_disp, bc_func)
        d2 = locate_dofs_geometric(pde_k.V_rot, bc_func)
        dofs = np.concatenate([d1, d2 + pde_k.V_disp.n_dofs])
        free_k, _ = combine_bcs(pde_k.W.n_dofs, [DirichletBC(dofs, 0.0)])
        return pde_k, free_k

    def can_coarsen(nx_k, ny_k):
        return (nx_k % 2 == 0 and ny_k % 2 == 0
                and (nx_k // 2) * (ny_k // 2) >= coarsest_cells)

    if not can_coarsen(mesh.nx, mesh.ny):
        return None

    if affine is None:
        affine = (pde.element_wise_material and pde.composite is None
                  and not pde.bot_plane)
    lane = bool(lane_major) and bool(affine)

    levels = []
    nx_k, ny_k = mesh.nx, mesh.ny
    comp_k = pde.composite
    pde_k, free_k = build_level(nx_k, ny_k, comp_k)
    while True:
        form_k = pde_k.make_residual_form()
        u0_k = jnp.zeros(pde_k.W.n_dofs, dtype=dtype)
        lev = {"space": pde_k.W, "free": free_k}

        if affine:
            from ...assembly.affine import CachedAffineAssembler

            # verify=False: these bases only feed the V-cycle smoothers —
            # preconditioner quality, not solution accuracy — and a full
            # direct-assembly check per level costs more than the build
            # (the solution-accuracy-critical fine-level operator basis in
            # RMShellModel keeps its verify)
            asm_k = CachedAffineAssembler(
                form_k, chunk=asm_chunk, dtype=dtype, verify=False,
                layout="lane" if lane else "cells",
                out_layout="lane" if lane else "cells")

            def make_Ae(p, asm_k=asm_k, u0_k=u0_k):
                return asm_k(u0_k, p, basis=p.get("_affine_basis"))

            lev["affine_asm"] = asm_k
        else:

            def make_Ae(p, form_k=form_k, u0_k=u0_k):
                Ae = element_matrices(form_k, u0_k, p, chunk=asm_chunk)
                return jnp.moveaxis(Ae, 0, -1) if lane else Ae

        lev["make_Ae"] = make_Ae
        if can_coarsen(nx_k, ny_k):
            cT = _field_coarsener(pde_k.VT, nx_k, ny_k)
            cF = _field_coarsener(pde_k.VF, nx_k, ny_k)
            cU = _field_coarsener(pde_k.VU, nx_k, ny_k)

            def coarsen(p, cT=cT, cF=cF, cU=cU):
                return {"thickness": cT(p["thickness"]), "E": cT(p["E"]),
                        "nu": cT(p["nu"]), "uhat": cU(p["uhat"]),
                        "F_solid": jnp.zeros_like(cF(p["F_solid"]))}

            lev["coarsen"] = coarsen
            levels.append(lev)
            if comp_k is not None:
                comp_k = _coarsen_composite(comp_k, nx_k, ny_k)
            nx_k, ny_k = nx_k // 2, ny_k // 2
            pde_k, free_k = build_level(nx_k, ny_k, comp_k)
        else:
            levels.append(lev)
            break

    def constrained_mv(Ae, space, free_mask):
        mv = make_matvec_T(Ae, space) if lane else make_matvec(Ae, space)
        return constrain_matvec(mv, free_mask)

    return GeometricMG(levels, constrained_mv, degree=degree,
                       lmin_ratio=lmin_ratio, lane_major=lane)


def _coarsen_composite(composite, nx, ny):
    """2x2 cell means of the per-cell CLT tensors (DG0 semantics)."""
    from .material import CompositeCLT

    def c(a):
        s = a.shape[1:]
        return a.reshape(nx // 2, 2, ny // 2, 2, *s).mean(axis=(1, 3)
                                                          ).reshape(-1, *s)

    return CompositeCLT(c(composite.A), c(composite.B), c(composite.D),
                        c(composite.As))


def shell_mg_precond_factory(mg, dtype=None):
    """precond_factory for ImplicitPDE.solver_opts: rebuilds the V-cycle
    state for the current parameters each (re)linearization and returns the
    preconditioner application (cast through `dtype` when the hierarchy is
    lower-precision than the solve)."""

    def factory(u, params):
        keys = ("thickness", "E", "nu", "uhat", "F_solid")
        p = {k: params[k] for k in keys}
        state = mg.setup(p, dtype=dtype)
        sdt = state["Ae"][0].dtype

        def M(v):
            return mg.apply(state, v.astype(sdt)).astype(v.dtype)

        return M

    return factory


class ShellMGPrecond:
    """Split-protocol preconditioner for ImplicitPDE's staged solve path:
    `prepare` runs host-side (affine basis caches, see assembly/affine.py),
    `setup_state` / `apply_state` are traceable and their state is a pytree
    — so the forward solve's preconditioner state is REUSED by the adjoint
    solve through the custom_vjp residuals instead of being rebuilt."""

    _KEYS = ("thickness", "E", "nu", "uhat", "F_solid")

    def __init__(self, mg: GeometricMG, dtype=None):
        self.mg = mg
        self.dtype = dtype

    def prepare(self, params):
        p = {k: params[k] for k in self._KEYS if k in params}
        bases = []
        for lev in self.mg.levels:
            asm = lev.get("affine_asm")
            if asm is None:
                return ()
            b = asm.prepare(p)
            if b is None:
                return ()
            bases.append(b)
            if "coarsen" in lev:
                p = lev["coarsen"](p)
        return tuple(bases)

    def setup_state(self, u, params, ops_Ae, aux):
        p = {k: params[k] for k in self._KEYS if k in params}
        return self.mg.setup(p, Ae0=ops_Ae[0], dtype=self.dtype,
                             bases=aux if aux else None)

    def apply_state(self, state, v):
        sdt = state["Ae"][0].dtype
        return self.mg.apply(state, v.astype(sdt)).astype(v.dtype)

    def shard_state(self, state, spec):
        """Multi-chip product path (parallel/product.py): constrain each
        level's element matrices over the cell axis so the V-cycle's
        smoother/residual matvecs partition SPMD with the fine operator."""
        from ...parallel.product import shard_mg_state

        return shard_mg_state(self.mg, state, spec)
