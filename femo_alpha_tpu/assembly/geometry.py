"""Geometry mapping helpers used inside cell kernels (pure JAX).

Replaces the Jacobian computations FFCx emits into its C kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


def cell_jacobian(x_cell, gdphi):
    """J[g, r] = d x_g / d xi_r at one quadrature point.

    x_cell: (nv, gdim) cell vertex coords; gdphi: (nv, rdim) geometry basis
    reference gradients at the point. For affine simplices J is constant; for
    bilinear quads it varies per point.
    """
    return jnp.einsum("ag,ar->gr", x_cell, gdphi)


def det_2x2(J):
    return J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]


def inv_2x2(J):
    d = det_2x2(J)
    return jnp.array([[J[1, 1], -J[0, 1]], [-J[1, 0], J[0, 0]]]) / d


def det_metric(J):
    """Surface measure sqrt(det(J^T J)) for gdim x rdim Jacobians (shells:
    3x2). Equals |detJ| when square."""
    G = J.T @ J
    if G.shape == (1, 1):
        return jnp.sqrt(G[0, 0])
    return jnp.sqrt(jnp.clip(det_2x2(G), a_min=0.0))


# ------------------------- batched-over-quadrature helpers (inside vmap) ----
def jacobians(x_cell, geom_dphi):
    """All-quadrature-point Jacobians: (nq, gdim, rdim).

    x_cell: (nv, gdim); geom_dphi: (nq, nv, rdim) numpy table (static)."""
    return jnp.einsum("ag,qar->qgr", x_cell, jnp.asarray(geom_dphi))


def det_2x2_b(J):
    return J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]


def inv_2x2_b(J):
    d = det_2x2_b(J)
    inv = jnp.stack(
        [
            jnp.stack([J[..., 1, 1], -J[..., 0, 1]], axis=-1),
            jnp.stack([-J[..., 1, 0], J[..., 0, 0]], axis=-1),
        ],
        axis=-2,
    )
    return inv / d[..., None, None]


def map_gradients(x_cell, tab):
    """Physical basis gradients + quadrature measure for square Jacobians.

    Returns (dphi_x (nq, nd, gdim), wdet (nq,)) where wdet = w_q * |detJ_q|.
    Handles rdim == gdim in {1, 2}."""
    J = jacobians(x_cell, tab.geom_dphi)  # (nq, g, r)
    dphi = jnp.asarray(tab.dphi)  # (nq, nd, r)
    w = jnp.asarray(tab.weights)
    if J.shape[-1] == 1:
        detJ = J[:, 0, 0]
        dphi_x = dphi / detJ[:, None, None]
        return dphi_x, w * jnp.abs(detJ)
    detJ = det_2x2_b(J)
    invJ = inv_2x2_b(J)  # (nq, r, g)
    dphi_x = jnp.einsum("qar,qrg->qag", dphi, invJ)
    return dphi_x, w * jnp.abs(detJ)
