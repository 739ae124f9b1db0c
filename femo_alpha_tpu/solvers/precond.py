"""Preconditioners assembled from element matrices (device-resident).

Replaces the reference's MUMPS-LU-as-preconditioner role with TPU-friendly
point/block Jacobi (SURVEY.md §7.3: thin shells are the hard case; stronger
options layer on top of these primitives).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def jacobi_preconditioner(Ae, dofmap_d, n_dofs, free_mask=None):
    """Point Jacobi from element-matrix diagonals. Returns M: v -> D^{-1} v.

    With a constrained operator (identity on BC dofs) pass free_mask so the
    BC diagonal is 1."""
    diag_cells = jnp.diagonal(Ae, axis1=1, axis2=2)  # (nc, nd)
    diag = jax.ops.segment_sum(
        diag_cells.reshape(-1), dofmap_d.reshape(-1), num_segments=n_dofs
    )
    if free_mask is not None:
        diag = free_mask * diag + (1.0 - free_mask)
    inv = jnp.where(diag != 0.0, 1.0 / diag, 1.0)

    def M(v):
        return inv * v

    return M


def block_jacobi_preconditioner(
    Ae, scalar_dofmap_d, n_scalar, bs, free_mask=None, local_offset=0,
    n_dofs=None, global_offset=0,
):
    """Node-block Jacobi for a (sub)space with `bs` interleaved components.

    Ae: element matrices over the FULL local dof vector of the form's space;
    scalar_dofmap_d: (nc, nd_scalar) scalar dofmap of the (sub)space;
    local_offset: where this sub's dofs start inside the element matrix;
    global_offset: where this sub's dofs start in the global vector.

    Returns M: full-length v -> block-solved v (other subs' entries passed
    through point-Jacobi-free, i.e. unchanged — compose with jacobi for them).
    """
    nc, nd_scalar = scalar_dofmap_d.shape
    n_dofs = n_dofs if n_dofs is not None else n_scalar * bs
    # extract (nc, nd_scalar, bs, bs) diagonal blocks
    blocks = jax.vmap(
        lambda A: jnp.stack(
            [
                jax.lax.dynamic_slice(
                    A, (local_offset + a * bs, local_offset + a * bs), (bs, bs)
                )
                for a in range(nd_scalar)
            ]
        )
    )(Ae)  # (nc, nd_scalar, bs, bs)
    D = jax.ops.segment_sum(
        blocks.reshape(-1, bs * bs),
        scalar_dofmap_d.reshape(-1),
        num_segments=n_scalar,
    ).reshape(n_scalar, bs, bs)
    if free_mask is not None:
        fm = free_mask[global_offset: global_offset + n_scalar * bs].reshape(
            n_scalar, bs
        )
        # zero constrained rows/cols, unit diagonal there
        D = D * fm[:, :, None] * fm[:, None, :]
        D = D + jnp.eye(bs)[None] * (1.0 - fm)[:, :, None] * jnp.eye(bs)[None]
    # regularize exactly-zero diagonals (unused dofs)
    dd = jnp.abs(jnp.diagonal(D, axis1=1, axis2=2)).sum(axis=(1,))
    D = jnp.where((dd == 0.0)[:, None, None], jnp.eye(bs)[None], D)
    Dinv = jnp.linalg.inv(D)

    def M(v):
        seg = jax.lax.dynamic_slice(v, (global_offset,), (n_scalar * bs,))
        seg = jnp.einsum("nij,nj->ni", Dinv, seg.reshape(n_scalar, bs)).reshape(-1)
        return jax.lax.dynamic_update_slice(v, seg, (global_offset,))

    return M
