"""FEA utility belt — parity with the reference's ~50 free helpers
(femo_alpha/fea/utils_dolfinx.py, SURVEY.md §2.1 'FEA utility belt').

Mapping (reference -> here):
  readFEAMesh/reconstructFEAMesh      -> io.xdmf.read_xdmf_mesh / mesh.reconstructFEAMesh
  createUnitSquare/Rectangle/Interval -> mesh.generation
  getFuncArray/setFuncArray/update    -> trivial (arrays ARE the state; no
                                          PETSc vec round trips exist)
  assembleScalar/Vector/Matrix        -> assembly.assemble.assemble_scalar/
                                          assemble_residual/element_matrices
  assembleSystem                      -> solvers.linear.LinearSolver (+lift)
  computePartials/assemble_partials   -> jax.vjp/jacfwd through assembly
  errorNorm                           -> errorNorm (here)
  solveNonlinear/NewtonSolver/SNES    -> solvers.newton.newton_solve
  solveKSP/solveKSP_mumps             -> solvers.linear.LinearSolver
  move(mesh, u)                       -> move (here)
  createCustomMeasure                 -> assembly.facets.select_facets
  project                             -> project (here)
  findNodeIndices/locateDOFs          -> spaces.locate_dofs_geometric /
                                          spaces.pointeval.point_eval_rows
  gradx/J/F (shape kinematics)        -> models.rm_shell.kinematics
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..assembly.assemble import FemForm, assemble_residual, element_matrices
from ..assembly.geometry import map_gradients
from ..spaces import FunctionSpace
from ..spaces.pointeval import point_eval_rows


def errorNorm(space: FunctionSpace, u, exact_fn, norm="L2", quad_degree=None):
    """||u_h - u_exact||_{L2 or H1-semi} — parity with errorNorm
    (utils_dolfinx.py:244-256), for scalar Lagrange spaces on flat meshes."""
    tab = space.tabulate(quad_degree=quad_degree or 2 * space.degree + 2)
    phi = jnp.asarray(tab.phi)
    pts = tab.points
    # physical quadrature points per cell for evaluating the exact solution
    geom_phi = tab.geom_phi  # (nq, nv)
    xq = np.einsum("qa,cag->cqg", geom_phi, space.mesh.cell_coords())
    ue = jnp.asarray(
        np.apply_along_axis(
            lambda x: exact_fn(x.reshape(1, -1))[0], -1, xq)
    )  # (nc, nq)

    def cell_err(u_cell, x_cell, ue_cell):
        _, wdet = map_gradients(x_cell, tab)
        uq = phi @ u_cell
        return jnp.sum(wdet * (uq - ue_cell) ** 2)

    uc = space.gather(jnp.asarray(u))
    vals = jax.vmap(cell_err)(uc, space.cell_coords_d, ue)
    return float(jnp.sqrt(jnp.sum(vals)))


def project(space: FunctionSpace, fn_or_values, lump_mass=False,
            quad_degree=None):
    """L2 projection of per-quadrature-point values (or a coordinate
    callable) into `space` — parity with project (utils_dolfinx.py:568-...,
    linear_shell_fenicsx/utils.py:52-86), with optional mass lumping."""
    tab = space.tabulate(quad_degree=quad_degree or 2 * space.degree + 2)
    phi = jnp.asarray(tab.phi)
    geom_phi = tab.geom_phi
    xq = np.einsum("qa,cag->cqg", geom_phi, space.mesh.cell_coords())
    if callable(fn_or_values):
        vals = jnp.asarray(
            np.apply_along_axis(
                lambda x: fn_or_values(x.reshape(1, -1))[0], -1, xq))
    else:
        vals = jnp.asarray(fn_or_values)  # (nc, nq)

    def cell_rhs(x_cell, v_cell):
        _, wdet = map_gradients(x_cell, tab)
        b = jnp.einsum("qa,q,q->a", phi, v_cell, wdet)
        m = jnp.einsum("qa,qb,q->ab", phi, phi, wdet)
        return b, (jnp.sum(m, axis=1) if lump_mass else m)

    b_c, m_c = jax.vmap(cell_rhs)(space.cell_coords_d, vals)
    b = space.scatter_add(b_c)
    if lump_mass:
        d = space.scatter_add(m_c)
        return b / d
    # assemble global mass and CG-solve (SPD, well conditioned)
    from ..solvers.krylov import cg_solve
    from ..assembly.assemble import make_matvec

    mv = make_matvec(m_c, space)
    x, _ = cg_solve(mv, b, tol=1e-12, maxiter=10 * space.n_dofs)
    return x


def move(mesh, displacement):
    """Move mesh coordinates by a nodal displacement (move,
    utils_dolfinx.py:533-553). Returns a NEW mesh (meshes are immutable
    here; the shape-derivative path uses uhat instead)."""
    from ..mesh import Mesh

    disp = np.asarray(displacement).reshape(mesh.n_nodes, mesh.gdim)
    return Mesh(mesh.coords + disp, mesh.conn, mesh.cell_type)


def calculateSurfaceArea(mesh):
    """Total surface area (linear_shell_fenicsx/utils.py:89)."""
    from ..models.rm_shell.kinematics import surface_geometry
    from ..elements import tabulate

    tab = tabulate("P", mesh.cell_type, 1, quad_degree=2)
    x = jnp.asarray(mesh.cell_coords())

    def cell_area(xc):
        geo = surface_geometry(xc, tab.geom_dphi)
        return jnp.sum(jnp.asarray(tab.weights) * geo["dA"])

    return float(jnp.sum(jax.vmap(cell_area)(x)))


class Delta:
    """Point-load application: nearest-basis force distribution — parity
    with the Delta/Delta_cpt/Delta_mpt classes
    (linear_shell_fenicsx/utils.py:123-199). Builds a load vector that
    applies forces at arbitrary physical points via FE basis rows."""

    def __init__(self, space: FunctionSpace, points):
        self.space = space
        self.rows = point_eval_rows(space, points)

    def apply(self, forces):
        """forces: (n_points, value_size) -> global load vector."""
        vs = self.space.value_size
        F = np.zeros(self.space.n_dofs)
        forces = np.atleast_2d(np.asarray(forces))
        for (c, dofs, wts), f in zip(self.rows, forces):
            for comp in range(vs):
                F[dofs * vs + comp] += wts * f[comp]
        return jnp.asarray(F)


def computeNodalDisp(space, u):
    """CG2 -> nodal (CG1) displacement values — parity with computeNodalDisp
    (linear_shell_fenicsx/utils.py:105-114): vertex dofs come first in the
    dof layout, so this is a slice."""
    nn = space.mesh.n_nodes
    vs = space.value_size
    return jnp.asarray(u)[: nn * vs].reshape(nn, vs)


def getCellID(coords, mesh):
    """Containing-cell id per physical point — parity with getCellID
    (linear_shell_fenicsx/utils.py:200-218, BoundingBoxTree collision
    query). Setup-time host code: nearest-midpoint candidates + Newton
    pull-back (spaces.pointeval)."""
    space = FunctionSpace(mesh, "P", 1)
    rows = point_eval_rows(space, np.atleast_2d(np.asarray(coords)))
    return np.array([c for c, _, _ in rows], dtype=np.int64)


def getVertexToDofMap(W):
    """(n_vertices, vs) dof indices of the displacement subspace's vertex
    dofs inside the mixed global vector — parity with getVertexToDofMap
    (linear_shell_fenicsx/utils.py:248-288). The reference needs a
    cell-walk to invert dolfinx's dof layout; here the layout is explicit
    by construction (sub0 dofs lead the mixed vector, vertex scalar dofs
    lead sub0, components interleaved), so the map is an arange."""
    sub = W.subspaces[0] if hasattr(W, "subspaces") else W
    nn, vs = sub.mesh.n_nodes, sub.value_size
    return np.arange(nn * vs, dtype=np.int64).reshape(nn, vs)


def applyNodalForces(f_array, W):
    """Scatter per-vertex forces (n_vertices, vs) into a W-sized load
    vector at the displacement vertex dofs — parity with applyNodalForces
    (linear_shell_fenicsx/utils.py:227-246)."""
    vtx_to_dof = getVertexToDofMap(W)
    F = np.zeros(W.n_dofs)
    F[vtx_to_dof.reshape(-1)] = np.asarray(f_array).reshape(-1)
    return jnp.asarray(F)


def projectPointForce(space, f_array, tol=1e-12):
    """Riesz-map a dual (load) vector into `space`: solve M u = f with the
    consistent mass matrix — parity with projectPointForce
    (linear_shell_fenicsx/utils.py:21-48). Vector spaces solve per
    component against the scalar mass (the vector mass is component-block
    diagonal)."""
    from ..solvers.krylov import cg_solve
    from ..assembly.assemble import make_matvec

    vs = space.value_size
    scalar = (space if vs == 1 else
              FunctionSpace(space.mesh, space.family, space.degree))
    tab = scalar.tabulate(quad_degree=2 * scalar.degree + 2)
    phi = jnp.asarray(tab.phi)

    def cell_mass(x_cell):
        _, wdet = map_gradients(x_cell, tab)
        return jnp.einsum("qa,qb,q->ab", phi, phi, wdet)

    m_c = jax.vmap(cell_mass)(scalar.cell_coords_d)
    mv = make_matvec(m_c, scalar)
    f = jnp.asarray(f_array).reshape(scalar.n_dofs, vs)
    cols = []
    for comp in range(vs):
        x, _ = cg_solve(mv, f[:, comp], tol=tol,
                        maxiter=10 * scalar.n_dofs)
        cols.append(x)
    return jnp.stack(cols, axis=1).reshape(-1) if vs > 1 else cols[0]
