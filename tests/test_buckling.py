"""Panel-buckling utilities (models/rm_shell/buckling.py) vs the reference
formulas (lpc_gust_response_opt/utils.py:398-468) and basic physics."""

import numpy as np
import jax
import pytest

from femo_alpha_tpu.models.rm_shell import buckling as bk


E, NU = 69e9, 0.33


def test_k_lookups_nearest_key():
    # exact keys
    assert bk.compression_k(1.0) == 3.29
    assert bk.compression_k(0.4) == 6.92
    # nearest (non-tie) selection — the reference's min(|k-x|) rule
    assert bk.compression_k(0.55) == 4.23     # -> 0.6
    assert bk.compression_k(7.0) == 3.29      # clamps to 3.0
    assert bk.shear_k(1.47) == 5.84           # -> 1.5
    # shear table is a/b-symmetric: ratios < 1 invert first
    assert bk.shear_k(0.5) == bk.shear_k(2.0) == 5.43


def test_flat_plate_formulas_match_reference_expression():
    t, b, ar = 0.004, 0.35, 1.2
    s = bk.flat_plate_sigma_cr(E, NU, t, b, ar)
    tau = bk.flat_plate_tau_cr(E, NU, t, b, ar)
    np.testing.assert_allclose(s, 3.40 * E / (1 - NU**2) * (t / b) ** 2,
                               rtol=1e-14)
    np.testing.assert_allclose(tau, 6.58 * E / (1 - NU**2) * (t / b) ** 2,
                               rtol=1e-14)


def test_curved_panel_limits_to_flat_plate():
    # r -> inf: the curved formula reduces to (pi^2/3) E/(1-nu^2) (t/b)^2,
    # i.e. the k=3.29 flat-plate value (the table's square-panel entry).
    t, b = 0.002, 0.4
    s_curved = float(bk.curved_panel_sigma_cr(E, NU, t, b, r=1e12))
    s_flat = bk.flat_plate_sigma_cr(E, NU, t, b, aspect_ratio=1.0)
    np.testing.assert_allclose(s_curved, s_flat, rtol=2e-3)
    # finite curvature strictly stabilizes (higher critical stress)
    assert float(bk.curved_panel_sigma_cr(E, NU, t, b, r=0.8)) > s_flat


def test_bay_dimensions_rectangle():
    # lower rib edge (0-1) along x (length 0.3 = b), spar direction (0-2)
    # along y (length 0.9 = a), reference corner ordering
    corners = np.array([[0.0, 0.0, 0.0], [0.3, 0.0, 0.0],
                        [0.0, 0.9, 0.1], [0.3, 0.9, 0.1]])
    a, b, ar = bk.bay_dimensions(corners)
    np.testing.assert_allclose(b, 0.3, rtol=1e-12)
    np.testing.assert_allclose(a, np.hypot(0.9, 0.1), rtol=1e-12)
    np.testing.assert_allclose(ar, a / b, rtol=1e-12)


def test_margins_differentiable_and_monotone_in_thickness():
    corners = np.array([[0.0, 0.0, 0.0], [0.4, 0.0, 0.0],
                        [0.0, 0.5, 0.0], [0.4, 0.5, 0.0]])

    def margin(t):
        return bk.bay_buckling_margins(40e6, 10e6, E, NU, t, corners,
                                       knockdown=1.5)

    m2, m4 = float(margin(0.002)), float(margin(0.004))
    assert m4 > m2  # thicker panel -> larger margin
    g = float(jax.grad(margin)(0.003))
    # FD check of the exact gradient
    eps = 1e-7
    fd = (float(margin(0.003 + eps)) - float(margin(0.003 - eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-5)
    assert g > 0.0
    # margin crosses zero as t -> 0 (must buckle)
    assert float(margin(0.0004)) < 0.0


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
