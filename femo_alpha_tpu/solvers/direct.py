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


def solve_spd_small(M, b):
    """Unrolled Cholesky solve for tiny static-size SPD systems (n <= ~6),
    e.g. per-cell DG1 projection masses. Pure arithmetic — lowers on every
    backend and dtype (the TPU plugin implements neither LuDecomposition nor
    Cholesky for f64; batched tiny LAPACK calls would also serialize badly).
    M: (..., n, n), b: (..., n)."""
    n = M.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    y = []
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y.append(s / L[i][i])
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
