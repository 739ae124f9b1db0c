"""LinearSolver: one object per linearized system, dispatching between
matrix-free Krylov and dense direct, with BC constraints and transpose
solves for adjoints built in.

This is the KSP/MUMPS façade replacement: the reference builds a MUMPS KSP
once per Jacobian and reuses it for forward and transposed solves
(state_operation.py:292-296, fea_dolfinx.py:173-203); here the analogues are
a cached LU (dense path) or the self-transpose constrained CG operator
(iterative path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..assembly.assemble import make_matvec
from ..assembly.bc import constrain_matvec, lift_rhs
from .direct import DenseSolver, apply_bc_dense, dense_from_elements
from .krylov import cg_solve, gmres_solve
from .precond import jacobi_preconditioner


class LinearSolver:
    """Solve A x = b with strong-BC masking.

    Ae/dofmap define the raw (unconstrained) operator; free_mask/bc_vals the
    Dirichlet data. method: 'dense' | 'cg' | 'gmres'. pc: 'jacobi' | None
    (iterative methods only).
    """

    def __init__(
        self,
        Ae,
        dofmap_d,
        n_dofs,
        free_mask=None,
        method="cg",
        pc="jacobi",
        tol=1e-12,
        maxiter=None,
        symmetric=True,
        extra_matvec=None,
    ):
        self.n = n_dofs
        self.method = method
        self.symmetric = symmetric
        self.tol = tol
        self.maxiter = maxiter or max(200, 4 * int(n_dofs**0.5) + 100)
        self.free_mask = (
            jnp.ones(n_dofs, dtype=Ae.dtype) if free_mask is None else free_mask
        )
        base_mv = make_matvec(Ae, dofmap_d, n_dofs)
        baseT_mv = make_matvec(jnp.swapaxes(Ae, 1, 2), dofmap_d, n_dofs)
        if extra_matvec is not None:
            # linearized non-cell terms (point loads contribute zero; penalty
            # facet terms contribute their Jacobian). Transpose via
            # jax.linear_transpose for adjoint solves.
            extra_T = jax.linear_transpose(
                extra_matvec, jnp.zeros(n_dofs, dtype=Ae.dtype)
            )
            self.raw_matvec = lambda x: base_mv(x) + extra_matvec(x)
            self.rawT_matvec = lambda x: baseT_mv(x) + extra_T(x)[0]
        else:
            self.raw_matvec = base_mv
            self.rawT_matvec = baseT_mv
        self.matvec = constrain_matvec(self.raw_matvec, self.free_mask)
        self.matvecT = constrain_matvec(self.rawT_matvec, self.free_mask)
        if method == "dense":
            A = dense_from_elements(Ae, dofmap_d, n_dofs)
            if extra_matvec is not None:
                A = A + jax.vmap(extra_matvec, in_axes=1, out_axes=1)(
                    jnp.eye(n_dofs, dtype=Ae.dtype)
                )
            A = apply_bc_dense(A, self.free_mask)
            self._dense = DenseSolver(A)
            self.M = None
        else:
            self._dense = None
            if pc == "jacobi":
                self.M = jacobi_preconditioner(
                    Ae, dofmap_d, n_dofs, self.free_mask
                )
            else:
                self.M = None
        self.last_info = None

    def lift(self, b, bc_vals):
        """Apply BC lifting to a RHS (set BC entries to their values)."""
        return lift_rhs(self.raw_matvec, b, self.free_mask, bc_vals)

    def _krylov(self, op, b, x0):
        if self.method == "cg" and self.symmetric:
            return cg_solve(
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
