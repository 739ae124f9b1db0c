"""Gather -> batched cell kernel -> segment_sum scatter assembly.

This is the TPU-native replacement of dolfinx `assemble_vector/matrix`
(SURVEY.md §2.2): every cell's local contribution is computed by one
`jax.vmap`-batched pure function, then scattered with `segment_sum`. Because
assembly is pure JAX, partial derivatives of the residual w.r.t. any
parameter (dR/df in the reference, state_operation.py:222-258) come from
`jax.vjp` through this function — no hand-written partial forms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_dofs(x, dofmap_d):
    """TPU-safe dof gather: x (n_dofs,), dofmap (nc, nd) -> (nc, nd).

    Implemented as a 2D row gather (x reshaped to (n, 1)): the experimental
    TPU platform plugin wedges on 1D gather HLO but handles row gathers of
    2D operands; on CPU/GPU this lowers identically to x[dofmap]."""
    nc, nd = dofmap_d.shape
    return x.reshape(-1, 1)[dofmap_d.reshape(-1), :].reshape(nc, nd)


def gather_1d(x, idx):
    """TPU-safe 1D gather of scalars at indices idx."""
    return x.reshape(-1, 1)[idx, :][:, 0]


def scatter_add(dofmap_d, cell_vals, n_dofs):
    """Scatter-add per-cell local vectors into a global vector.

    dofmap_d: (nc, nd) int32; cell_vals: (nc, nd); returns (n_dofs,)."""
    return jax.ops.segment_sum(
        cell_vals.reshape(-1), dofmap_d.reshape(-1), num_segments=n_dofs
    )


class FemForm:
    """A weak form defined by a per-cell kernel over one state space.

    kernel(u_cell, x_cell, params) -> local residual (nd_local,) if
    `kind='residual'`, or a scalar cell energy/functional if `kind='energy'`
    (the residual is then its gradient — exactly how the reference derives
    residuals from energies via Gateaux derivative,
    linear_shell_model.py:308-321).

    param_specs: dict name -> FunctionSpace (cell-gathered) or None (scalar /
    global value passed through unmapped).
    """

    def __init__(self, space, kernel, kind="residual", param_specs=None,
                 dtype=None, cell_consts=None):
        self.space = space
        self.param_specs = dict(param_specs or {})
        # cell_consts: fixed per-cell arrays (leading axis = cells) mapped
        # into the kernel alongside gathered params — e.g. composite CLT
        # tensors (the reference's DG0 tensor Functions,
        # linear_shell_model.py:159-190) or subdomain masks
        self.cell_consts = {
            k: jnp.asarray(v) for k, v in (cell_consts or {}).items()
        }
        # dtype: cast cell inputs (dofs, coords, params) before the kernel —
        # with the kernel's static tables cast to match (ElementTables.astype)
        # this yields a genuinely single-precision assembly path (on TPU, f64
        # is emulated: an f32 form assembles ~10x faster and compiles much
        # smaller programs)
        self.dtype = dtype
        if kind == "energy":
            self.energy_kernel = kernel
            self.kernel = jax.grad(kernel, argnums=0)
        else:
            self.energy_kernel = None
            self.kernel = kernel

    def _cast(self, a):
        if self.dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(self.dtype)
        return a

    def gather_params(self, params):
        out, axes = {}, {}
        for name, sp in self.param_specs.items():
            v = params[name]
            if sp is None:
                out[name] = v
                axes[name] = None
            else:
                out[name] = self._cast(sp.gather(jnp.asarray(v)))
                axes[name] = 0
        for name, v in self.cell_consts.items():
            out[name] = self._cast(v)
            axes[name] = 0
        return out, axes

    def cell_values(self, fn, u, params, chunk=None, remat=False):
        """vmap fn(u_cell, x_cell, pcells) over cells.

        chunk: process cells in blocks of this size via lax.map (bounds the
        peak HBM of wide-tangent jacfwd batches on large meshes; the padding
        blowup of tiny trailing dims makes unchunked jacfwd exceed HBM at
        ~50k+ cells).

        remat: jax.checkpoint the per-chunk computation, so a jax.vjp
        through this assembly saves only the chunk INPUTS and recomputes
        kernel intermediates in the backward pass. Without it the saved
        (nq, nc, nd, 3, 3)-shaped kernel intermediates get pathological
        TPU tile padding (3x3 trailing dims pad ~57x: 162 MB unpadded ->
        9 GB padded, observed OOM at 512x128 / 65k cells)."""
        uc = self._cast(self.space.gather(jnp.asarray(u)))
        pc, axes = self.gather_params(params)
        xc = self._cast(self.space.cell_coords_d)
        nc = uc.shape[0]
        if chunk is None or nc <= chunk:
            if remat:
                fn = jax.checkpoint(fn)
            return jax.vmap(fn, in_axes=(0, 0, axes))(uc, xc, pc)
        # largest divisor of nc that is <= chunk
        c = chunk
        while nc % c != 0:
            c -= 1
        k = nc // c

        def reshape_chunked(a):
            return a.reshape((k, c) + a.shape[1:])

        uc_k = reshape_chunked(uc)
        xc_k = reshape_chunked(xc)
        pc_k = {
            name: (reshape_chunked(v) if axes[name] == 0 else v)
            for name, v in pc.items()
        }

        def per_chunk(args):
            u_b, x_b, p_b = args
            pfull = dict(p_b)
            for name in self.scalar_names():
                pfull[name] = pc[name]
            return jax.vmap(fn, in_axes=(0, 0, axes))(u_b, x_b, pfull)

        if remat:
            per_chunk = jax.checkpoint(per_chunk)
        mapped_p = {n: pc_k[n] for n in pc_k if axes[n] == 0}
        out = jax.lax.map(per_chunk, (uc_k, xc_k, mapped_p))
        return jax.tree.map(
            lambda a: a.reshape((nc,) + a.shape[2:]), out)

    def scalar_names(self):
        return [n for n, sp in self.param_specs.items() if sp is None]


def assemble_residual(form: FemForm, u, params=None, chunk=16384):
    """Assembled residual vector. Chunked + rematerialized over cells for
    the same reason element_matrices chunks: on big meshes the energy
    kernel's fwd (and its jax.vjp-saved) intermediates otherwise blow HBM
    through TPU tile padding (see cell_values)."""
    params = params or {}
    rc = form.cell_values(form.kernel, u, params, chunk=chunk, remat=True)
    return form.space.scatter_add(rc)


def assemble_scalar(form_or_space, kernel_or_u=None, u=None, params=None):
    """assemble_scalar(form, u, params) for an energy-kind form: sum of cell
    energies (a global functional, parity with assembleScalar,
    utils_dolfinx.py:188)."""
    form, u, params = form_or_space, kernel_or_u, u or {}
    vals = form.cell_values(form.energy_kernel, u, params)
    return jnp.sum(vals)


def assemble_scalar_subset(form: FemForm, u, params, cells):
    """Sum of cell energies over a STATIC subset of cells — O(|subset|)
    gather + kernel work instead of mask-scaling the full mesh. This is the
    TPU equivalent of the reference's tagged custom measures
    (createCustomMeasure, utils_dolfinx.py:555-565; per-tag pnorm outputs,
    rm_shell_model.py:457-462): the subset's dofmap/coords/param rows are
    indexed once at trace time, so an output over an n-cell tag costs n
    cells of work however many tags the model carries.

    cells: concrete integer cell indices (host array — baked static)."""
    import numpy as np

    cells_d = jnp.asarray(np.asarray(cells, dtype=np.int32))
    space = form.space
    uc = form._cast(gather_dofs(jnp.asarray(u), space.dofmap_d[cells_d]))
    xc = form._cast(space.cell_coords_d[cells_d])
    pc, axes = {}, {}
    for name, sp in form.param_specs.items():
        v = params[name]
        if sp is None:
            pc[name] = v
            axes[name] = None
        else:
            pc[name] = form._cast(
                gather_dofs(jnp.asarray(v), sp.dofmap_d[cells_d]))
            axes[name] = 0
    for name, v in form.cell_consts.items():
        pc[name] = form._cast(v[cells_d])
        axes[name] = 0
    vals = jax.vmap(form.energy_kernel, in_axes=(0, 0, axes))(uc, xc, pc)
    return jnp.sum(vals)


def element_matrices(form: FemForm, u, params=None, chunk=16384):
    """Per-cell Jacobian dR_cell/du_cell: (nc, nd, nd). Replaces
    `ufl.derivative(R, u)` + FFCx matrix kernels (fea_dolfinx.py:81-82).
    Chunked over cells by default: jacfwd pushes nd tangents through the
    kernel at once, so peak memory is nd x the kernel's intermediates."""
    params = params or {}
    jac = jax.jacfwd(form.kernel, argnums=0)
    return form.cell_values(jac, u, params, chunk=chunk)


def cell_matvec(Ae, xc):
    """Per-cell matvec yc[c,i] = sum_j Ae[c,i,j] xc[c,j] as a VPU
    broadcast-multiply-reduce, NOT an einsum/dot.

    The dot_general lowering batches tiny nd x nd matmuls onto the MXU,
    padding both contraction dims to 128 — with `highest` f32 precision
    that's ~64x compute inflation, and for f64 the emulated MXU path costs
    41x more than this form (measured 25.6 ms vs 0.62 ms per matvec at 16k
    cells, nd=39). The mul+sum lowers to a fused VPU pass at HBM bandwidth
    in any dtype."""
    return jnp.sum(Ae * xc[:, None, :], axis=2)


def make_matvec(Ae, spec, n_dofs=None, lane_major=None):
    """Matrix-free operator x -> A@x from precomputed element matrices.

    spec: either a FunctionSpace/MixedSpace (uses its gather/scatter — the
    structured slice/pad fast path when available) or a raw (nc, nd) dofmap
    with explicit n_dofs. All contractions use the VPU sum-form (see
    cell_matvec) — never batched MXU dots."""
    if hasattr(spec, "gather"):

        def matvec(x):
            return spec.scatter_add(cell_matvec(Ae, spec.gather(x)))

        return matvec

    dofmap_d = spec

    def matvec(x):
        xc = gather_dofs(x, dofmap_d)
        return scatter_add(dofmap_d, cell_matvec(Ae, xc), n_dofs)

    return matvec


def cell_matvec_T(Ae_T, xc_T):
    """Lane-major per-cell matvec: Ae_T (nd, nd, nc), xc_T (nd, nc) ->
    (nd, nc); y_T[i, c] = sum_j Ae_T[i, j, c] xc_T[j, c].

    The (nd, nd, nc) layout keeps the big array pad-free on TPU (the lane
    dim nc is large), while the cell-major (nc, nd, nd) layout pads
    nd=39 -> 128 lanes (~3.3x memory AND bandwidth inflation on every
    matvec). Same VPU sum-form rationale as cell_matvec."""
    return jnp.sum(Ae_T * xc_T[None, :, :], axis=1)


def make_matvec_T(Ae_T, space):
    """Matrix-free operator x -> A@x from LANE-MAJOR element matrices
    (nd, nd, nc). Uses the space's lane-major gather/scatter (structured
    meshes: slice gathers + linear_transpose pad-add scatters).

    On TPU with f32 data the per-cell contraction runs as a Pallas kernel
    (pallas_kernels.cell_matvec_T_pallas) — XLA's fused form is ~9x off the
    HBM bandwidth bound for this op. Solver-facing only (the Pallas path
    has no AD rules); adjoints never differentiate through it (IFT adjoint
    solves use the same symmetric operator directly)."""
    from .pallas_kernels import cell_matvec_T_pallas, use_pallas_matvec

    def matvec(x):
        # mixed precision: an f32-stored operator (storage='f32' affine
        # basis) applied to f64 vectors runs the heavy per-cell
        # contraction in f32 — engaging the Pallas kernel — and returns
        # in the vector dtype. The product is f32-accurate by design; the
        # hostloop refinement owns true accuracy (assembly/affine.py).
        xcT = space.gather_T(x)
        if Ae_T.dtype != xcT.dtype:
            xcT = xcT.astype(Ae_T.dtype)
        bc = use_pallas_matvec(Ae_T, xcT)
        if bc is not None:
            ycT = cell_matvec_T_pallas(Ae_T, xcT, bc)
        else:
            ycT = cell_matvec_T(Ae_T, xcT)
        if ycT.dtype != x.dtype:
            ycT = ycT.astype(x.dtype)
        return space.scatter_add_T(ycT)

    return matvec


def transpose_cellwise(Ae):
    """(nc, nd, nd) -> (nd, nd, nc) element-matrix relayout (or back:
    (nd, nd, nc) -> (nc, nd, nd) via transpose_cellwise_inv)."""
    return jnp.moveaxis(Ae, 0, -1)


def transpose_cellwise_inv(Ae_T):
    return jnp.moveaxis(Ae_T, -1, 0)


def make_jvp_matvec(residual_fn, u):
    """Matrix-free Jacobian-vector operator via linearization of an assembled
    residual (for nonlinear problems where element matrices are not cached)."""
    _, lin = jax.linearize(residual_fn, u)
    return lin
