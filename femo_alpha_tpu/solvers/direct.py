"""Dense direct solves on device (the MUMPS-LU replacement for small/medium
systems; SURVEY.md §2.2). The LU factorization is computed once and reused
for repeated / transposed solves, mirroring the reference's cached MUMPS KSP
(state_operation.py:296, utils_dolfinx.py:514-531)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_from_elements(Ae, dofmap_d, n_dofs):
    """Scatter element matrices into a dense (n, n) device matrix."""
    nc, nd, _ = Ae.shape
    rows = jnp.repeat(dofmap_d, nd, axis=1).reshape(-1)
    cols = jnp.tile(dofmap_d, (1, nd)).reshape(-1)
    return (
        jnp.zeros((n_dofs, n_dofs), dtype=Ae.dtype)
        .at[rows, cols]
        .add(Ae.reshape(-1))
    )


def apply_bc_dense(A, free_mask):
    """Symmetric BC elimination on a dense matrix: identity rows/cols at BC."""
    f = free_mask
    A = A * f[:, None] * f[None, :]
    return A + jnp.diag(1.0 - f)


class DenseSolver:
    """Factor once, solve many (and solve with the transpose for adjoints —
    parity with MUMPS transpose solves, fea_dolfinx.py:182,198).

    spd=True uses Cholesky — preferred for our SPD systems and REQUIRED for
    float64 on TPU, where XLA's LuDecomposition is f32-only but Cholesky and
    TriangularSolve support f64."""

    def __init__(self, A, spd=False):
        self.spd = spd
        if spd:
            self.chol = jax.scipy.linalg.cho_factor(A)
        else:
            self.lu, self.piv = jax.scipy.linalg.lu_factor(A)

    def solve(self, b):
        if self.spd:
            return jax.scipy.linalg.cho_solve(self.chol, b)
        return jax.scipy.linalg.lu_solve((self.lu, self.piv), b)

    def solve_transpose(self, b):
        if self.spd:
            return jax.scipy.linalg.cho_solve(self.chol, b)
        return jax.scipy.linalg.lu_solve((self.lu, self.piv), b, trans=1)
