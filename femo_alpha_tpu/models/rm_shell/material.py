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
