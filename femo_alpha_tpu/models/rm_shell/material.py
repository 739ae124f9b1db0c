"""Constitutive (CLT) models for Reissner-Mindlin shells.

Parity with MaterialModel / MaterialModelComposite
(linear_shell_model.py:106-190): isotropic single-layer A/B/D/A_s matrices
with shear correction k = 0.833 and MID/BOT reference-plane variants, plus
per-cell composite CLT data as arrays.

All functions are pointwise (broadcast over quadrature points) so they can
sit inside vmapped cell kernels; jax.grad through them yields the thickness
partials the reference derives symbolically.
"""

from __future__ import annotations

import jax.numpy as jnp

SHEAR_CORRECTION = 0.833  # Nastran shear correction (linear_shell_model.py:146)


def plane_stress_C(E, nu):
    """(..., 3, 3) plane-stress stiffness from pointwise E, nu."""
    E = jnp.asarray(E)
    z = jnp.zeros_like(E)
    fac = E / (1.0 - nu * nu)
    row0 = jnp.stack([fac, fac * nu, z], axis=-1)
    row1 = jnp.stack([fac * nu, fac, z], axis=-1)
    row2 = jnp.stack([z, z, fac * 0.5 * (1.0 - nu)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


class CompositeCLT:
    """Per-cell laminate CLT data: A, B, D (nc, 3, 3) and A_s (nc, 2, 2).

    Parity with MaterialModelComposite (linear_shell_model.py:159-190),
    which loads precomputed CLT numpy arrays into DG0 tensor Functions; here
    the arrays ride the cell axis of the vmapped energy kernels directly
    (FemForm cell_consts), so jax.grad/jacfwd through the energy still yields
    all partials."""

    def __init__(self, A, B, D, As):
        import numpy as _np

        self.A = _np.asarray(A, dtype=_np.float64)
        self.B = _np.asarray(B, dtype=_np.float64)
        self.D = _np.asarray(D, dtype=_np.float64)
        self.As = _np.asarray(As, dtype=_np.float64)
        nc = self.A.shape[0]
        assert self.A.shape == (nc, 3, 3) and self.B.shape == (nc, 3, 3)
        assert self.D.shape == (nc, 3, 3) and self.As.shape == (nc, 2, 2)

    @classmethod
    def from_layup(cls, n_cells, E_layers, nu_layers, z_interfaces):
        """Classical lamination theory for a stack of isotropic plies.

        E_layers/nu_layers: (n_plies,) per-ply moduli; z_interfaces:
        (n_plies+1,) through-thickness interface coordinates (midplane at 0).
        Same laminate in every cell; per-cell layups can be built by stacking
        calls. A = sum C dz, B = sum C z dz, D = sum C z^2 dz."""
        import numpy as _np

        E = _np.asarray(E_layers, dtype=_np.float64)
        nu = _np.asarray(nu_layers, dtype=_np.float64)
        z = _np.asarray(z_interfaces, dtype=_np.float64)
        A = _np.zeros((3, 3))
        B = _np.zeros((3, 3))
        D = _np.zeros((3, 3))
        As = _np.zeros((2, 2))
        for k in range(len(E)):
            C = _np.asarray(plane_stress_C(E[k], nu[k]))
            z0, z1 = z[k], z[k + 1]
            A += C * (z1 - z0)
            B += C * (z1**2 - z0**2) / 2.0
            D += C * (z1**3 - z0**3) / 3.0
            G = E[k] / (2.0 * (1.0 + nu[k]))
            As += SHEAR_CORRECTION * G * (z1 - z0) * _np.eye(2)
        tile = lambda M: _np.broadcast_to(  # noqa: E731
            M, (n_cells,) + M.shape).copy()
        return cls(tile(A), tile(B), tile(D), tile(As))


def single_layer_clt(E, nu, h, bot=False):
    """Isotropic single-layer CLT (A, B, D, A_s) from pointwise E, nu, h.

    MID reference plane (default): A = hC, B = 0, D = h^3/12 C.
    BOT: A = hC, B = -h^2/2 C, D = h^3/3 C. A_s = k G h I2.
    (linear_shell_model.py:136-157 parity.)"""
    C = plane_stress_C(E, nu)
    G = E / (2.0 * (1.0 + nu))
    h = jnp.asarray(h)
    A = h[..., None, None] * C
    if bot:
        B = (-(h**2) / 2.0)[..., None, None] * C
        D = (h**3 / 3.0)[..., None, None] * C
    else:
        B = jnp.zeros_like(C)
        D = (h**3 / 12.0)[..., None, None] * C
    As = (SHEAR_CORRECTION * G * h)[..., None, None] * jnp.eye(2)
    return A, B, D, As
