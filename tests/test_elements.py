"""Element tabulation tests: partition of unity, FD-checked derivatives,
quadrature exactness (SURVEY.md §4: the rebuild upgrades the reference's
placeholder unit tests with per-layer suites)."""

import numpy as np
import pytest

from femo_alpha_tpu.elements import quadrature_rule, reference_element

CASES = [
    ("P", "interval", 1),
    ("Hermite", "interval", 3),
    ("P", "triangle", 1),
    ("P", "triangle", 2),
    ("CR", "triangle", 1),
    ("P", "quad", 1),
    ("P", "quad", 2),
    ("DG", "triangle", 1),
    ("DG", "quad", 0),
]


def _interior_points(cell_type, n=7):
    rng = np.random.default_rng(3)
    if cell_type == "interval":
        return rng.uniform(0.05, 0.95, (n, 1))
    pts = rng.uniform(0.05, 0.45, (n, 2))
    return pts  # inside triangle and quad


@pytest.mark.parametrize("family,cell,deg", CASES)
def test_partition_of_unity(family, cell, deg):
    elem = reference_element(family, cell, deg)
    pts = _interior_points(cell)
    phi = elem.tabulate(pts, 0)
    if family == "Hermite":
        # value dofs only (derivative shape functions sum to x-dependent)
        assert np.allclose(phi[:, 0] + phi[:, 2], 1.0, atol=1e-12)
    else:
        assert np.allclose(phi.sum(axis=1), 1.0, atol=1e-12)


@pytest.mark.parametrize("family,cell,deg", CASES)
def test_gradients_match_fd(family, cell, deg):
    elem = reference_element(family, cell, deg)
    pts = _interior_points(cell)
    dphi = elem.tabulate(pts, 1)
    eps = 1e-6
    for r in range(elem.rdim):
        dp = pts.copy()
        dp[:, r] += eps
        dm = pts.copy()
        dm[:, r] -= eps
        fd = (elem.tabulate(dp, 0) - elem.tabulate(dm, 0)) / (2 * eps)
        assert np.allclose(dphi[:, :, r], fd, atol=1e-7), (family, cell, deg, r)


@pytest.mark.parametrize(
    "family,cell,deg",
    [("P", "triangle", 2), ("P", "quad", 2), ("Hermite", "interval", 3)],
)
def test_hessians_match_fd(family, cell, deg):
    elem = reference_element(family, cell, deg)
    pts = _interior_points(cell)
    d2 = elem.tabulate(pts, 2)
    eps = 1e-5
    for r in range(elem.rdim):
        dp = pts.copy()
        dp[:, r] += eps
        dm = pts.copy()
        dm[:, r] -= eps
        fd = (elem.tabulate(dp, 1) - elem.tabulate(dm, 1)) / (2 * eps)
        assert np.allclose(d2[:, :, :, r], fd, atol=1e-5)


def test_lagrange_nodal_property():
    for family, cell, deg in [
        ("P", "triangle", 2),
        ("P", "quad", 2),
        ("P", "quad", 1),
    ]:
        elem = reference_element(family, cell, deg)
        phi = elem.tabulate(elem.node_coords, 0)
        assert np.allclose(phi, np.eye(elem.ndof), atol=1e-12)


@pytest.mark.parametrize("cell", ["interval", "triangle", "quad"])
def test_quadrature_exactness(cell):
    for deg in range(1, 6):
        pts, w = quadrature_rule(cell, deg)
        # integrate all monomials x^a y^b with a+b <= deg
        for a in range(deg + 1):
            for b in range(deg + 1 - a):
                if cell == "interval" and b > 0:
                    continue
                x = pts[:, 0]
                y = pts[:, 1] if pts.shape[1] > 1 else 0 * x
                val = np.sum(w * x**a * (y**b if pts.shape[1] > 1 else 1.0))
                if cell == "interval":
                    exact = 1.0 / (a + 1)
                elif cell == "quad":
                    exact = 1.0 / ((a + 1) * (b + 1))
                else:  # triangle: ∫ x^a y^b = a! b! / (a+b+2)!
                    from math import factorial

                    exact = (
                        factorial(a)
                        * factorial(b)
                        / factorial(a + b + 2)
                    )
                assert abs(val - exact) < 1e-12, (cell, deg, a, b)


def test_hermite_nodal_property():
    elem = reference_element("Hermite", "interval", 3)
    pts = np.array([[0.0], [1.0]])
    phi = elem.tabulate(pts, 0)
    dphi = elem.tabulate(pts, 1)[:, :, 0]
    # value dofs: phi(0)=[1,0,0,0], phi(1)=[0,0,1,0]
    assert np.allclose(phi[0], [1, 0, 0, 0], atol=1e-14)
    assert np.allclose(phi[1], [0, 0, 1, 0], atol=1e-14)
    # slope dofs: phi'(0)=[0,1,0,0], phi'(1)=[0,0,0,1]
    assert np.allclose(dphi[0], [0, 1, 0, 0], atol=1e-14)
    assert np.allclose(dphi[1], [0, 0, 0, 1], atol=1e-14)
