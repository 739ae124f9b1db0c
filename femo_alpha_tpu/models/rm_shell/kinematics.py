"""Shell kinematics in pure JAX, batched over quadrature points.

Re-derives the reference's UFL tangential calculus
(rm_shell/linear_shell_fenicsx/kinematics.py: gradx/J/F/local_basis_inplane/
global_to_local_inplane/voigt2D) as closed-form small-matrix algebra:

- the surface Jacobian Jg = dx/dxi is (3, 2); physical (tangent-plane)
  gradients use the pseudo-inverse Pi = (Jg^T Jg)^{-1} Jg^T
- the mesh-motion field uhat deforms the configuration: F = I3 + grad(uhat),
  gradx(f) = grad(f) @ inv(F), J = det(F) — the shape-derivative mechanism
  of the reference (SURVEY.md §3.5)
- the local orthonormal frame is E2 = unit(a0 x a1) (cell normal),
  E0 = unit(a0), E1 = E2 x E0, from the REFERENCE configuration (parity with
  local_basis_inplane which uses the undeformed mesh Jacobian)
"""

from __future__ import annotations

import jax.numpy as jnp


def _norm(v, axis=-1):
    return jnp.sqrt(jnp.sum(v * v, axis=axis))


def surface_geometry(x_cell, geom_dphi):
    """Per-quadrature-point surface geometry.

    x_cell (nv, 3); geom_dphi (nq, nv, 2) static table.
    Returns dict with Jg (nq,3,2), dA (nq,), frame E0/E1/E2 (nq,3),
    Pi (nq,2,3) = d(xi)/dx pseudo-inverse."""
    gd = jnp.asarray(geom_dphi)
    Jg = jnp.einsum("ag,qar->qgr", x_cell, gd)
    a0, a1 = Jg[:, :, 0], Jg[:, :, 1]
    nvec = jnp.cross(a0, a1)
    dA = _norm(nvec)
    E2 = nvec / dA[:, None]
    E0 = a0 / _norm(a0)[:, None]
    E1 = jnp.cross(E2, E0)
    G = jnp.einsum("qgr,qgs->qrs", Jg, Jg)  # metric (nq,2,2)
    detG = G[:, 0, 0] * G[:, 1, 1] - G[:, 0, 1] * G[:, 1, 0]
    Gi = (
        jnp.stack(
            [
                jnp.stack([G[:, 1, 1], -G[:, 0, 1]], axis=-1),
                jnp.stack([-G[:, 1, 0], G[:, 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / detG[:, None, None]
    )
    Pi = jnp.einsum("qrs,qgs->qrg", Gi, Jg)  # (nq, 2, 3)
    return dict(Jg=Jg, dA=dA, E0=E0, E1=E1, E2=E2, Pi=Pi)


def phys_grad_table(dphi, Pi):
    """Physical-gradient basis table: (nq, nd, 3) from reference gradients
    dphi (nq, nd, 2) and Pi (nq, 2, 3)."""
    return jnp.einsum("qar,qrg->qag", jnp.asarray(dphi), Pi)


def det_3x3(F):
    return (
        F[..., 0, 0] * (F[..., 1, 1] * F[..., 2, 2] - F[..., 1, 2] * F[..., 2, 1])
        - F[..., 0, 1] * (F[..., 1, 0] * F[..., 2, 2] - F[..., 1, 2] * F[..., 2, 0])
        + F[..., 0, 2] * (F[..., 1, 0] * F[..., 2, 1] - F[..., 1, 1] * F[..., 2, 0])
    )


def inv_3x3(F):
    d = det_3x3(F)
    c00 = F[..., 1, 1] * F[..., 2, 2] - F[..., 1, 2] * F[..., 2, 1]
    c01 = F[..., 0, 2] * F[..., 2, 1] - F[..., 0, 1] * F[..., 2, 2]
    c02 = F[..., 0, 1] * F[..., 1, 2] - F[..., 0, 2] * F[..., 1, 1]
    c10 = F[..., 1, 2] * F[..., 2, 0] - F[..., 1, 0] * F[..., 2, 2]
    c11 = F[..., 0, 0] * F[..., 2, 2] - F[..., 0, 2] * F[..., 2, 0]
    c12 = F[..., 0, 2] * F[..., 1, 0] - F[..., 0, 0] * F[..., 1, 2]
    c20 = F[..., 1, 0] * F[..., 2, 1] - F[..., 1, 1] * F[..., 2, 0]
    c21 = F[..., 0, 1] * F[..., 2, 0] - F[..., 0, 0] * F[..., 2, 1]
    c22 = F[..., 0, 0] * F[..., 1, 1] - F[..., 0, 1] * F[..., 1, 0]
    inv = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return inv / d[..., None, None]


def deformation(uhat_nodes, dphi1_x):
    """F = I + grad(uhat), its inverse and determinant, per quadrature point.

    uhat_nodes (nv, 3); dphi1_x (nq, nv, 3) physical-gradient table of the
    geometry/CG1 element. Returns (F (nq,3,3), Finv, detF)."""
    Guh = jnp.einsum("ai,qag->qig", uhat_nodes, dphi1_x)
    F = jnp.eye(3)[None] + Guh
    return F, inv_3x3(F), det_3x3(F)


def cell_diameter(x_cell):
    """Max vertex-pair distance (UFL CellDiameter parity)."""
    d = x_cell[:, None, :] - x_cell[None, :, :]
    return jnp.sqrt(jnp.max(jnp.sum(d * d, axis=-1)))


def sym2(M):
    """Symmetrize a (..., 2, 2) tensor."""
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def voigt2d(M, strain=True):
    """(..., 2, 2) symmetric tensor -> (..., 3) Voigt (off-diag doubled for
    strains; kinematics.py:94-107 parity)."""
    fac = 2.0 if strain else 1.0
    return jnp.stack([M[..., 0, 0], M[..., 1, 1], fac * M[..., 0, 1]], axis=-1)
