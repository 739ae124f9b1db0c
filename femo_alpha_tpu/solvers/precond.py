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


def mixed_block_jacobi(Ae, W, free_mask=None):
    """Node-block Jacobi for a MixedSpace of vector subspaces (the RM shell's
    CG2(vec3) x CG1(vec3)): per-scalar-node value_size x value_size diagonal
    blocks, extracted from the element matrices, inverted in batch.

    Stronger than point Jacobi on shells because it couples the components
    of each node (translations resp. rotations) — the reference gets this
    coupling for free from MUMPS; iteratively it is the cheapest block
    preconditioner that respects the mixed structure. All device work is
    slicing + one segment_sum at build; the application is pure reshaping."""
    import jax.numpy as jnp

    nc = Ae.shape[0]
    appliers = []
    for i, sub in enumerate(W.subspaces):
        o = W.local_slices[i].start
        bs = sub.value_size
        nds = sub.element.ndof
        subA = Ae[:, o: o + nds * bs, o: o + nds * bs].reshape(
            nc, nds, bs, nds, bs)
        a_idx = jnp.arange(nds)
        blocks = subA[:, a_idx, :, a_idx, :]  # (nds, nc, bs, bs)
        blocks = jnp.swapaxes(blocks, 0, 1).reshape(nc * nds, bs, bs)
        D = jax.ops.segment_sum(
            blocks.reshape(nc * nds, bs * bs),
            jnp.asarray(sub.scalar_dofmap).reshape(-1),
            num_segments=sub.n_scalar_dofs,
        ).reshape(sub.n_scalar_dofs, bs, bs)
        o_g = int(W.offsets[i])
        if free_mask is not None:
            fm = free_mask[o_g: o_g + sub.n_dofs].reshape(
                sub.n_scalar_dofs, bs)
            D = D * fm[:, :, None] * fm[:, None, :] + jnp.eye(bs)[None] * (
                1.0 - fm)[:, :, None] * jnp.eye(bs)[None]
        dd = jnp.abs(jnp.diagonal(D, axis1=1, axis2=2)).sum(axis=1)
        D = jnp.where((dd == 0.0)[:, None, None], jnp.eye(bs)[None], D)
        Dinv = jnp.linalg.inv(D)
        appliers.append((o_g, sub.n_dofs, bs, Dinv))

    def M(v):
        parts = []
        for o_g, n_sub, bs, Dinv in appliers:
            seg = v[o_g: o_g + n_sub].reshape(-1, bs)
            parts.append(
                jnp.sum(Dinv * seg[:, None, :], axis=2).reshape(-1))
        return jnp.concatenate(parts)

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
        seg = jnp.sum(
            Dinv * seg.reshape(n_scalar, bs)[:, None, :], axis=2
        ).reshape(-1)
        return jax.lax.dynamic_update_slice(v, seg, (global_offset,))

    return M
