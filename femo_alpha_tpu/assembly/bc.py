"""Strong Dirichlet BC handling by symmetric masking.

Replaces dolfinx `dirichletbc` + `apply_lifting` + `set_bc` + PETSc
`zeroRows` (SURVEY.md §2.2, utils_dolfinx.py:208-221). The constrained
operator B(v) = free*(A(free*v)) + bc*v keeps SPD structure so CG stays
applicable, and its transpose equals itself structurally — transposed adjoint
solves (fea_dolfinx.py:189-203) need no special casing beyond zeroing the
multiplier at BC dofs, which the masking does implicitly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import fdtype


class DirichletBC:
    """dofs: global dof indices (component-expanded); values: same length or
    scalar."""

    def __init__(self, dofs, values=0.0):
        self.dofs = np.asarray(dofs, dtype=np.int32)
        values = np.asarray(values, dtype=np.float64)
        if values.ndim == 0:
            values = np.full(len(self.dofs), float(values))
        self.values = values


def combine_bcs(n_dofs, bcs):
    """Return (free_mask (n,), bc_vals (n,)) as device arrays."""
    free = np.ones(n_dofs, dtype=np.float64)
    vals = np.zeros(n_dofs, dtype=np.float64)
    for bc in bcs or []:
        free[bc.dofs] = 0.0
        vals[bc.dofs] = bc.values
    return jnp.asarray(free, dtype=fdtype()), jnp.asarray(vals, dtype=fdtype())


def constrain_matvec(matvec, free_mask):
    """B(v) = free*(A(free*v)) + (1-free)*v  — identity on BC dofs."""

    def op(v):
        return free_mask * matvec(free_mask * v) + (1.0 - free_mask) * v

    return op


def lift_rhs(matvec, b, free_mask, bc_vals):
    """RHS for the constrained system so the solution carries bc values:
    c = free*(b - A(bc_vals_extended)) + bc*bc_vals."""
    g = (1.0 - free_mask) * bc_vals
    return free_mask * (b - matvec(g)) + g


def constrain_residual(residual, u, free_mask, bc_vals):
    """Nonlinear residual with BC rows replaced by (u - u_bc)."""
    return free_mask * residual + (1.0 - free_mask) * (u - bc_vals)
