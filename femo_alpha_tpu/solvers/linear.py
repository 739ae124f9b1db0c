"""LinearSolver: one object per linearized system, dispatching between
matrix-free Krylov and dense direct, with BC constraints and transpose
solves for adjoints built in.

This is the KSP/MUMPS façade replacement: the reference builds a MUMPS KSP
once per Jacobian and reuses it for forward and transposed solves
(state_operation.py:292-296, fea_dolfinx.py:173-203); here the analogues are
a cached LU (dense path) or the self-transpose constrained operator
(iterative path).

The operator is a SUM of element-matrix blocks: cell integrals plus facet
integrals (penalty BCs) each contribute one (Ae, dofmap) pair — all enter
the matvec, the dense matrix, and the Jacobi preconditioner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..assembly.assemble import (
    make_matvec,
    make_matvec_T,
    scatter_add,
    transpose_cellwise_inv,
)
from ..assembly.bc import constrain_matvec, lift_rhs
from .direct import DenseSolver, apply_bc_dense, dense_from_elements
from .krylov import cg_solve, cg_solve_df, gmres_solve


def _use_df_vectors(dtype):
    """Float-float CG vector state: ON by default on the TPU backend for
    f64 systems (measured 2.8-16x on the emulated-f64 vector ops, see
    cg_solve_df), OFF elsewhere (CPU f64 is native). FEMO_CG_DF=0/1
    overrides."""
    import os

    flag = os.environ.get("FEMO_CG_DF")
    if flag is not None:
        return flag == "1"
    return (jax.default_backend() == "tpu"
            and dtype == jnp.dtype(jnp.float64))


def _dm(spec):
    """Raw dofmap from an op spec (space or dofmap)."""
    return spec.dofmap_d if hasattr(spec, "dofmap_d") else spec


def _sum_matvec(fns):
    def mv(x):
        y = fns[0](x)
        for f in fns[1:]:
            y = y + f(x)
        return y

    return mv


class LinearSolver:
    """Solve A x = b with strong-BC masking.

    ops: list of (Ae (nc, nd, nd), spec) element-matrix blocks where spec is
    a FunctionSpace/MixedSpace (structured fast path when available) or a raw
    (nc, nd) dofmap; their sum is the raw operator. method: 'dense' | 'cg' |
    'gmres'. pc: 'jacobi' | None. extra_matvec: optional additional linear
    operator (matrix-free; excluded from the preconditioner).

    op0_layout: layout of ops[0]'s element matrices — 'cells' (nc, nd, nd)
    or 'lane' (nd, nd, nc), the pad-free TPU layout (assembly.cell_matvec_T:
    cell-major pads nd=39 -> 128 lanes on every matvec, ~3.3x HBM traffic;
    lane-major also rides the Pallas VPU kernel). 'lane' requires ops[0]'s
    spec to be a space with gather_T/scatter_add_T. Facet blocks (ops[1:])
    stay cell-major — they are O(boundary) small."""

    def __init__(
        self,
        ops,
        n_dofs,
        free_mask=None,
        method="cg",
        pc="jacobi",
        tol=1e-12,
        maxiter=None,
        symmetric=True,
        extra_matvec=None,
        M=None,
        op0_layout="cells",
    ):
        if not isinstance(ops, (list, tuple)):
            raise TypeError("ops must be a list of (Ae, dofmap) pairs")
        self.ops = ops
        self.n = n_dofs
        self.method = method
        self.symmetric = symmetric
        self.tol = tol
        self.op0_lane = op0_layout == "lane"
        if self.op0_lane and not hasattr(ops[0][1], "gather_T"):
            raise ValueError(
                "op0_layout='lane' requires a space spec with gather_T")
        # CG terminates in <= n iterations in exact arithmetic; allow slack
        # for rounding. A too-small cap silently truncates the solve.
        self.maxiter = maxiter or min(max(500, 10 * n_dofs), 200_000)
        dtype = ops[0][0].dtype
        self.free_mask = (
            jnp.ones(n_dofs, dtype=dtype) if free_mask is None else free_mask
        )
        if self.op0_lane:
            Ae0, sp0 = ops[0]
            mvs = [make_matvec_T(Ae0, sp0)]
            mvTs = [make_matvec_T(jnp.swapaxes(Ae0, 0, 1), sp0)]
        else:
            mvs = [make_matvec(ops[0][0], ops[0][1], n_dofs)]
            mvTs = [make_matvec(jnp.swapaxes(ops[0][0], 1, 2), ops[0][1],
                                n_dofs)]
        mvs += [make_matvec(Ae, dm, n_dofs) for Ae, dm in ops[1:]]
        mvTs += [
            make_matvec(jnp.swapaxes(Ae, 1, 2), dm, n_dofs)
            for Ae, dm in ops[1:]
        ]
        if extra_matvec is not None:
            extra_T = jax.linear_transpose(
                extra_matvec, jnp.zeros(n_dofs, dtype=dtype)
            )
            mvs = mvs + [extra_matvec]
            mvTs = mvTs + [lambda x: extra_T(x)[0]]
        self.raw_matvec = _sum_matvec(mvs)
        self.rawT_matvec = _sum_matvec(mvTs)
        self.matvec = constrain_matvec(self.raw_matvec, self.free_mask)
        self.matvecT = constrain_matvec(self.rawT_matvec, self.free_mask)
        if method == "dense":
            Ae0 = (transpose_cellwise_inv(ops[0][0]) if self.op0_lane
                   else ops[0][0])
            A = dense_from_elements(Ae0, _dm(ops[0][1]), n_dofs)
            for Ae, dm in ops[1:]:
                A = A + dense_from_elements(Ae, _dm(dm), n_dofs)
            if extra_matvec is not None:
                A = A + jax.vmap(extra_matvec, in_axes=1, out_axes=1)(
                    jnp.eye(n_dofs, dtype=dtype)
                )
            A = apply_bc_dense(A, self.free_mask)
            self._dense = DenseSolver(A, spd=symmetric)
            self.M = None
        else:
            self._dense = None
            # M: externally supplied preconditioner application v -> M^{-1}v
            # (e.g. a geometric-multigrid V-cycle); falls back to Jacobi
            if M is not None:
                self.M = M
            else:
                self.M = self._build_jacobi() if pc == "jacobi" else None
        self.last_info = None

    def _build_jacobi(self):
        diag = jnp.zeros(self.n, dtype=self.ops[0][0].dtype)
        for k, (Ae, dm) in enumerate(self.ops):
            if k == 0 and self.op0_lane:
                # lane-major (nd, nd, nc): diagonal over the two nd axes
                dc = jnp.diagonal(Ae, axis1=0, axis2=1)  # (nc, nd)
            else:
                dc = jnp.diagonal(Ae, axis1=1, axis2=2)
            if hasattr(dm, "scatter_add"):
                diag = diag + dm.scatter_add(dc)
            else:
                diag = diag + scatter_add(dm, dc, self.n)
        diag = self.free_mask * diag + (1.0 - self.free_mask)
        inv = jnp.where(diag != 0.0, 1.0 / diag, 1.0)
        return lambda v: inv * v

    def lift(self, b, bc_vals):
        """Apply BC lifting to a RHS (set BC entries to their values)."""
        return lift_rhs(self.raw_matvec, b, self.free_mask, bc_vals)

    def _krylov(self, op, b, x0):
        if self.method == "cg" and self.symmetric:
            cg = cg_solve_df if _use_df_vectors(b.dtype) else cg_solve
            return cg(
                op, b, x0=x0, M=self.M, tol=self.tol, maxiter=self.maxiter
            )
        return gmres_solve(
            op, b, x0=x0, M=self.M, tol=self.tol,
            maxiter=max(2, self.maxiter // 50),
        )

    def solve(self, b, x0=None):
        if self._dense is not None:
            return self._dense.solve(b)
        x, info = self._krylov(self.matvec, b, x0)
        self.last_info = info
        return x

    def solve_transpose(self, b, x0=None):
        if self._dense is not None:
            return self._dense.solve_transpose(b)
        op = self.matvec if self.symmetric else self.matvecT
        x, info = self._krylov(op, b, x0)
        self.last_info = info
        return x
