"""Function spaces: dofmaps + dof coordinates + Function containers.

Replaces dolfinx FunctionSpace / dofmap machinery (SURVEY.md §2.2). Dofmaps
are built once in numpy; device copies live on the space as jnp arrays.

Local dof ordering inside a cell:
  scalar: [vertex dofs (element order), edge dofs, cell dofs]
  vector (value_size=vs): interleaved — local index a*vs + c for scalar dof a,
  component c; globally dof = scalar_dof*vs + c (block layout, matching
  dolfinx blocked spaces).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..elements import reference_element, tabulate
from ..mesh import Mesh


def _build_scalar_dofmap(mesh: Mesh, elem):
    """Returns (dofmap (n_cells, nd) int32, n_scalar_dofs)."""
    nv_d, ne_d, nc_d = elem.entity_dofs
    mesh._build_topology()
    cols = []
    n_local_vertices = mesh.conn.shape[1]
    if nv_d > 0:
        for v in range(n_local_vertices):
            for k in range(nv_d):
                cols.append(nv_d * mesh.conn[:, v] + k)
    off_e = nv_d * mesh.n_nodes
    if ne_d > 0:
        for e in range(mesh.cell_edges.shape[1]):
            for k in range(ne_d):
                cols.append(off_e + ne_d * mesh.cell_edges[:, e] + k)
    off_c = off_e + ne_d * mesh.n_edges
    if nc_d > 0:
        cid = np.arange(mesh.n_cells)
        for k in range(nc_d):
            cols.append(off_c + nc_d * cid + k)
    dofmap = np.stack(cols, axis=1).astype(np.int32)
    n_dofs = off_c + nc_d * mesh.n_cells
    assert dofmap.shape[1] == elem.ndof, (dofmap.shape, elem.ndof)
    return dofmap, n_dofs


def _structured_layout(mesh, family, degree, vs):
    """Slice-based gather / pad-based scatter closures for grid-ordered dofs
    on a StructuredQuadMesh (see mesh/structured.py). Returns None when the
    (family, degree) pair has no structured specialization.

    Every closure is returned JITTED: besides being faster for eager
    callers (tests, host-side setup), jax 0.9.0's EAGER dispatch on the
    forced multi-device CPU backend (--xla_force_host_platform_device_count)
    corrupts the heap on exactly this pad/stack/moveaxis op mix (minimal
    repro: glibc 'malloc(): invalid size' after a few hundred dispatches;
    the jitted path is clean) — the test suite runs on an 8-device CPU
    mesh by contract, so eager execution of these closures is a crash."""
    import jax
    import jax.numpy as jnp

    nx, ny = mesh.nx, mesh.ny
    nc = nx * ny
    nV = (nx + 1) * (ny + 1)
    nEX = nx * (ny + 1)
    nEY = (nx + 1) * ny

    def pad(a, px, py):
        return jnp.pad(a, (px, py, (0, 0)))

    if family in ("P", "CG", "Lagrange", "Q") and degree == 1:

        def parts_p1(x):
            V = x.reshape(nx + 1, ny + 1, vs)
            return [V[:-1, :-1], V[1:, :-1], V[1:, 1:], V[:-1, 1:]]

        def gather(x):
            return jnp.stack(parts_p1(x), axis=2).reshape(nc, 4 * vs)

        def scatter(cv):
            g = cv.reshape(nx, ny, 4, vs)
            V = (
                pad(g[:, :, 0], (0, 1), (0, 1))
                + pad(g[:, :, 1], (1, 0), (0, 1))
                + pad(g[:, :, 2], (1, 0), (1, 0))
                + pad(g[:, :, 3], (0, 1), (1, 0))
            )
            return V.reshape(-1)

        def gather_T(x):
            G = jnp.stack(parts_p1(x), axis=0)  # (4, nx, ny, vs)
            return jnp.moveaxis(G, 3, 1).reshape(4 * vs, nc)

        def scatter_T(cvT):
            # explicit adjoint of gather_T (NOT jax.linear_transpose: the
            # transposed slice/stack program miscompiles on TPU f32 at
            # large grids — see solvers.multigrid._restrict_axis)
            g = jnp.moveaxis(cvT.reshape(4, vs, nx, ny), 1, 3)
            V = (
                pad(g[0], (0, 1), (0, 1))
                + pad(g[1], (1, 0), (0, 1))
                + pad(g[2], (1, 0), (1, 0))
                + pad(g[3], (0, 1), (1, 0))
            )
            return V.reshape(-1)

        return (jax.jit(gather), jax.jit(scatter),
                jax.jit(gather_T), jax.jit(scatter_T))

    if family in ("P", "CG", "Lagrange", "Q") and degree == 2:

        def parts_p2(x):
            o1 = nV * vs
            o2 = o1 + nEX * vs
            o3 = o2 + nEY * vs
            V = x[:o1].reshape(nx + 1, ny + 1, vs)
            EX = x[o1:o2].reshape(nx, ny + 1, vs)
            EY = x[o2:o3].reshape(nx + 1, ny, vs)
            C = x[o3:].reshape(nx, ny, vs)
            return [
                V[:-1, :-1], V[1:, :-1], V[1:, 1:], V[:-1, 1:],
                EX[:, :-1], EY[1:, :], EX[:, 1:], EY[:-1, :], C,
            ]

        def gather(x):
            return jnp.stack(parts_p2(x), axis=2).reshape(nc, 9 * vs)

        def scatter(cv):
            g = cv.reshape(nx, ny, 9, vs)
            V = (
                pad(g[:, :, 0], (0, 1), (0, 1))
                + pad(g[:, :, 1], (1, 0), (0, 1))
                + pad(g[:, :, 2], (1, 0), (1, 0))
                + pad(g[:, :, 3], (0, 1), (1, 0))
            )
            EX = pad(g[:, :, 4], (0, 0), (0, 1)) + pad(
                g[:, :, 6], (0, 0), (1, 0))
            EY = pad(g[:, :, 5], (1, 0), (0, 0)) + pad(
                g[:, :, 7], (0, 1), (0, 0))
            C = g[:, :, 8]
            return jnp.concatenate(
                [V.reshape(-1), EX.reshape(-1), EY.reshape(-1), C.reshape(-1)]
            )

        def gather_T(x):
            G = jnp.stack(parts_p2(x), axis=0)  # (9, nx, ny, vs)
            return jnp.moveaxis(G, 3, 1).reshape(9 * vs, nc)

        def scatter_T(cvT):
            # explicit adjoint of gather_T (see P1 scatter_T note)
            g = jnp.moveaxis(cvT.reshape(9, vs, nx, ny), 1, 3)
            V = (
                pad(g[0], (0, 1), (0, 1))
                + pad(g[1], (1, 0), (0, 1))
                + pad(g[2], (1, 0), (1, 0))
                + pad(g[3], (0, 1), (1, 0))
            )
            EX = pad(g[4], (0, 0), (0, 1)) + pad(g[6], (0, 0), (1, 0))
            EY = pad(g[5], (1, 0), (0, 0)) + pad(g[7], (0, 1), (0, 0))
            C = g[8]
            return jnp.concatenate(
                [V.reshape(-1), EX.reshape(-1), EY.reshape(-1), C.reshape(-1)]
            )

        return (jax.jit(gather), jax.jit(scatter),
                jax.jit(gather_T), jax.jit(scatter_T))

    if family == "DG" and degree in (0, 1):
        nd = 1 if degree == 0 else 4

        def gather(x):
            return x.reshape(nc, nd * vs)

        def scatter(cv):
            return cv.reshape(-1)

        def gather_T(x):
            return x.reshape(nc, nd * vs).T

        def scatter_T(cvT):
            return cvT.T.reshape(-1)

        return (jax.jit(gather), jax.jit(scatter),
                jax.jit(gather_T), jax.jit(scatter_T))

    return None


class FunctionSpace:
    """A (possibly vector-valued) finite element space on a mesh."""

    def __init__(self, mesh: Mesh, family: str, degree: int, value_size: int = 1):
        self.mesh = mesh
        self.family = family
        self.degree = degree
        self.value_size = value_size
        self.element = reference_element(family, mesh.cell_type, degree)
        self.scalar_dofmap, self.n_scalar_dofs = _build_scalar_dofmap(
            mesh, self.element
        )
        self.n_dofs = self.n_scalar_dofs * value_size
        self.nd_local = self.element.ndof * value_size
        if value_size == 1:
            self.dofmap = self.scalar_dofmap
        else:
            vs = value_size
            self.dofmap = (
                self.scalar_dofmap[:, :, None] * vs + np.arange(vs)[None, None, :]
            ).reshape(mesh.n_cells, -1).astype(np.int32)
        # device copies
        self.dofmap_d = jnp.asarray(self.dofmap)
        self.cell_coords_d = jnp.asarray(mesh.cell_coords())
        self._dof_coords = None
        # structured fast path (slice gather / pad scatter) when available
        self._layout = None
        if getattr(mesh, "structured", False):
            self._layout = _structured_layout(mesh, family, degree, value_size)

    # ------------------------------------------------- gather/scatter
    def gather(self, x):
        """(n_dofs,) -> (nc, nd_local) cell-dof values."""
        if self._layout is not None:
            return self._layout[0](x)
        from ..assembly.assemble import gather_dofs

        return gather_dofs(x, self.dofmap_d)

    def scatter_add(self, cell_vals):
        """(nc, nd_local) -> (n_dofs,) scatter-add."""
        if self._layout is not None:
            return self._layout[1](cell_vals)
        import jax

        return jax.ops.segment_sum(
            cell_vals.reshape(-1),
            self.dofmap_d.reshape(-1),
            num_segments=self.n_dofs,
        )

    # ------------------------------------- lane-major gather/scatter
    # Cell-dof data in (nd_local, nc) layout: on TPU the minor-most (lane)
    # dim is padded to 128, so (nc, 39)-style arrays waste ~3.3x memory
    # bandwidth while (39, nc) is pad-free. The hot solver paths (element
    # matvec, smoothers) run in this layout; see assembly.make_matvec_T.
    def gather_T(self, x):
        """(n_dofs,) -> (nd_local, nc) cell-dof values (lane-major)."""
        if self._layout is not None and len(self._layout) > 2:
            return self._layout[2](x)
        return self.gather(x).T

    def scatter_add_T(self, cell_vals_T):
        """(nd_local, nc) -> (n_dofs,) scatter-add (lane-major).

        Machine-exact adjoint of gather_T, written EXPLICITLY in the
        structured layout (pad-adds mirroring `scatter`). It was
        previously derived with jax.linear_transpose, but the transposed
        slice/stack program MISCOMPILES on TPU f32 at large grids
        (~0.9 rel error at the 988k hierarchy's 248k-dof level) — the
        root cause of the round-4 scale-point divergence; see
        solvers.multigrid._restrict_axis."""
        if self._layout is not None and len(self._layout) > 3:
            return self._layout[3](cell_vals_T)
        return self.scatter_add(cell_vals_T.T)

    # ------------------------------------------------------------- coords
    @property
    def dof_coords(self):
        """(n_scalar_dofs, gdim) physical coordinates of each scalar dof
        (Hermite derivative dofs share their vertex coordinate)."""
        if self._dof_coords is None:
            elem = self.element
            geom = reference_element("P", self.mesh.cell_type, 1)
            gphi = geom.tabulate(elem.node_coords, 0)  # (nd, nv)
            # physical node positions per cell: (nc, nd, gdim)
            pos = np.einsum("ab,cbg->cag", gphi, self.mesh.cell_coords())
            coords = np.zeros((self.n_scalar_dofs, self.mesh.gdim))
            coords[self.scalar_dofmap.ravel()] = pos.reshape(-1, self.mesh.gdim)
            self._dof_coords = coords
        return self._dof_coords

    def tabulate(self, quad_degree=None, with_hessian=False, points=None,
                 weights=None):
        return tabulate(
            self.family,
            self.mesh.cell_type,
            self.degree,
            quad_degree=quad_degree,
            with_hessian=with_hessian,
            points=points,
            weights=weights,
        )

    def function(self, array=None, name=None):
        return Function(self, array=array, name=name)

    def __repr__(self):
        return (
            f"FunctionSpace({self.element.name}, vs={self.value_size}, "
            f"ndofs={self.n_dofs})"
        )


class MixedSpace:
    """Concatenation of function spaces (e.g. RM shell: CG2 vec3 x CG1 vec3).

    Global vector = [sub0 dofs | sub1 dofs | ...]. Per-cell local dofs are
    the concatenation of each sub's local dofs; `dofmap` maps into the global
    concatenated vector.
    """

    def __init__(self, *subspaces: FunctionSpace):
        self.subspaces = list(subspaces)
        self.mesh = subspaces[0].mesh
        self.offsets = np.cumsum([0] + [s.n_dofs for s in self.subspaces])
        self.n_dofs = int(self.offsets[-1])
        self.nd_local = sum(s.nd_local for s in self.subspaces)
        maps = [
            s.dofmap + off for s, off in zip(self.subspaces, self.offsets[:-1])
        ]
        self.dofmap = np.concatenate(maps, axis=1).astype(np.int32)
        self.dofmap_d = jnp.asarray(self.dofmap)
        self.cell_coords_d = subspaces[0].cell_coords_d
        self.local_slices = []
        o = 0
        for s in self.subspaces:
            self.local_slices.append(slice(o, o + s.nd_local))
            o += s.nd_local

    def gather(self, x):
        parts = [
            s.gather(x[self.offsets[i]: self.offsets[i + 1]])
            for i, s in enumerate(self.subspaces)
        ]
        import jax.numpy as _jnp

        return _jnp.concatenate(parts, axis=1)

    def scatter_add(self, cell_vals):
        import jax.numpy as _jnp

        parts = [
            s.scatter_add(cell_vals[:, self.local_slices[i]])
            for i, s in enumerate(self.subspaces)
        ]
        return _jnp.concatenate(parts)

    def gather_T(self, x):
        """(n_dofs,) -> (nd_local, nc) lane-major cell-dof values."""
        import jax.numpy as _jnp

        parts = [
            s.gather_T(x[self.offsets[i]: self.offsets[i + 1]])
            for i, s in enumerate(self.subspaces)
        ]
        return _jnp.concatenate(parts, axis=0)

    def scatter_add_T(self, cell_vals_T):
        """(nd_local, nc) -> (n_dofs,) lane-major scatter-add."""
        import jax.numpy as _jnp

        parts = [
            s.scatter_add_T(cell_vals_T[self.local_slices[i], :])
            for i, s in enumerate(self.subspaces)
        ]
        return _jnp.concatenate(parts)

    def split(self, x):
        """Split a global mixed vector into per-subspace vectors."""
        return [
            x[self.offsets[i]: self.offsets[i + 1]]
            for i in range(len(self.subspaces))
        ]

    def function(self, array=None, name=None):
        return Function(self, array=array, name=name)


class Function:
    """A coefficient vector in a space. Thin wrapper: `.x` is the jnp array."""

    def __init__(self, space, array=None, name=None):
        self.space = space
        self.name = name
        from ..config import fdtype

        if array is None:
            self.x = jnp.zeros(space.n_dofs, dtype=fdtype())
        else:
            self.x = jnp.asarray(array, dtype=fdtype()).reshape(space.n_dofs)

    def interpolate(self, fn):
        """Interpolate a callable fn(coords (n, gdim)) -> (n,) or (n, vs)
        at the dof coordinates (Lagrange spaces only)."""
        sp = self.space
        vals = np.asarray(fn(sp.dof_coords))
        if sp.value_size == 1:
            self.x = jnp.asarray(vals.reshape(-1))
        else:
            self.x = jnp.asarray(vals.reshape(-1))
        return self

    def copy(self):
        return Function(self.space, array=self.x, name=self.name)


def locate_dofs_geometric(space: FunctionSpace, predicate, component=None):
    """Global dof indices whose coordinates satisfy `predicate(coords)->bool`.

    Parity with dolfinx locate_dofs_geometrical (utils_dolfinx.py:626-651).
    `component=None` selects all value components; an int selects one.
    """
    mask = np.asarray(predicate(space.dof_coords)).astype(bool)
    scalar_dofs = np.where(mask)[0]
    vs = space.value_size
    if vs == 1:
        return scalar_dofs.astype(np.int32)
    if component is None:
        return (scalar_dofs[:, None] * vs + np.arange(vs)[None, :]).reshape(
            -1
        ).astype(np.int32)
    return (scalar_dofs * vs + component).astype(np.int32)
