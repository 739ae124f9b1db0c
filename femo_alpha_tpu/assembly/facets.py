"""Exterior-facet integral machinery (the reference's ds measures,
createCustomMeasure utils_dolfinx.py:555-565, and the penalty-BC facet terms
linear_shell_model.py:323-333).

TPU-native design: facets are grouped by their local-facet id at setup time;
each group gets static basis tables (evaluated at the edge quadrature points
mapped into the cell reference domain) and is processed as one vmapped batch
with the same gather -> kernel -> segment_sum pattern as cell assembly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..elements import reference_element
from ..elements.quadrature import quadrature_rule
from .assemble import gather_dofs, scatter_add

# local edge parametrizations xi(t), t in [0,1], and d(xi)/dt
_EDGE_PARAM = {
    "triangle": [
        (lambda t: np.stack([t, 0 * t], 1), np.array([1.0, 0.0])),
        (lambda t: np.stack([1 - t, t], 1), np.array([-1.0, 1.0])),
        (lambda t: np.stack([0 * t, 1 - t], 1), np.array([0.0, -1.0])),
    ],
    "quad": [
        (lambda t: np.stack([t, 0 * t], 1), np.array([1.0, 0.0])),
        (lambda t: np.stack([1 + 0 * t, t], 1), np.array([0.0, 1.0])),
        (lambda t: np.stack([1 - t, 1 + 0 * t], 1), np.array([-1.0, 0.0])),
        (lambda t: np.stack([0 * t, 1 - t], 1), np.array([0.0, -1.0])),
    ],
}


class EdgeTables:
    """Static tables for one local-facet id: reference points on the cell,
    1D weights, d(xi)/dt, and tabulated bases of requested elements."""

    def __init__(self, cell_type, local_id, quad_degree, families):
        t, w = quadrature_rule("interval", quad_degree)
        t = t[:, 0]
        param, dxi_dt = _EDGE_PARAM[cell_type][local_id]
        self.points = param(t)  # (nq, 2)
        self.weights = w
        self.dxi_dt = dxi_dt  # (2,)
        self.local_id = local_id
        self.tabs = {}
        for key in families:  # key = (family, degree)
            elem = reference_element(key[0], cell_type, key[1])
            self.tabs[key] = (
                elem.tabulate(self.points, 0),
                elem.tabulate(self.points, 1),
            )
        geom = reference_element("P", cell_type, 1)
        self.geom_phi = geom.tabulate(self.points, 0)
        self.geom_dphi = geom.tabulate(self.points, 1)


def select_facets(mesh, predicate):
    """Exterior facets whose midpoints satisfy predicate(coords (n,gdim)) ->
    bool mask. Parity with createCustomMeasure tagging by locator
    (utils_dolfinx.py:555-565)."""
    cells, locals_, verts = mesh.exterior_facets()
    mids = mesh.coords[verts].mean(axis=1)
    mask = np.asarray(predicate(mids)).astype(bool)
    return cells[mask], locals_[mask]


class FacetForm:
    """A boundary integral defined by an energy kernel per facet.

    kernel_factory(tabs: EdgeTables) -> energy(u_cell, x_cell, pcells) where
    u_cell/x_cell/pcells are the owning CELL's data (the kernel evaluates
    traces using the edge tables). kind='energy' only (residual = jax.grad).
    """

    def __init__(
        self,
        space,
        kernel_factory,
        facet_cells,
        facet_locals,
        param_specs=None,
        quad_degree=4,
        families=(),
    ):
        self.space = space
        self.param_specs = dict(param_specs or {})
        mesh = space.mesh
        self.groups = []
        n_local = 3 if mesh.cell_type == "triangle" else 4
        for l in range(n_local):
            sel = np.where(np.asarray(facet_locals) == l)[0]
            if len(sel) == 0:
                continue
            cells = np.asarray(facet_cells)[sel].astype(np.int32)
            tabs = EdgeTables(mesh.cell_type, l, quad_degree, families)
            energy = kernel_factory(tabs)
            self.groups.append(
                dict(
                    cells_d=jnp.asarray(cells),
                    dofmap_d=space.dofmap_d[jnp.asarray(cells)],
                    kernel=jax.grad(energy, argnums=0),
                    energy=energy,
                    jac=jax.jacfwd(jax.grad(energy, argnums=0), argnums=0),
                )
            )

    def _gather(self, params, cells_d):
        out, axes = {}, {}
        for name, sp in self.param_specs.items():
            v = params[name]
            if sp is None:
                out[name] = v
                axes[name] = None
            else:
                out[name] = gather_dofs(jnp.asarray(v), sp.dofmap_d[cells_d])
                axes[name] = 0
        return out, axes

    def assemble_residual(self, u, params):
        r = jnp.zeros(self.space.n_dofs, dtype=jnp.asarray(u).dtype)
        for g in self.groups:
            uc = gather_dofs(jnp.asarray(u), g["dofmap_d"])
            xc = self.space.cell_coords_d[g["cells_d"]]
            pc, axes = self._gather(params, g["cells_d"])
            rc = jax.vmap(g["kernel"], in_axes=(0, 0, axes))(uc, xc, pc)
            r = r + scatter_add(g["dofmap_d"], rc, self.space.n_dofs)
        return r

    def assemble_scalar(self, u, params):
        total = 0.0
        for g in self.groups:
            uc = gather_dofs(jnp.asarray(u), g["dofmap_d"])
            xc = self.space.cell_coords_d[g["cells_d"]]
            pc, axes = self._gather(params, g["cells_d"])
            total = total + jnp.sum(
                jax.vmap(g["energy"], in_axes=(0, 0, axes))(uc, xc, pc)
            )
        return total

    def element_ops(self, u, params):
        """[(Ae, dofmap)] pairs for the linearized operator."""
        ops = []
        for g in self.groups:
            uc = gather_dofs(jnp.asarray(u), g["dofmap_d"])
            xc = self.space.cell_coords_d[g["cells_d"]]
            pc, axes = self._gather(params, g["cells_d"])
            Ae = jax.vmap(g["jac"], in_axes=(0, 0, axes))(uc, xc, pc)
            ops.append((Ae, g["dofmap_d"]))
        return ops
