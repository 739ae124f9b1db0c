"""Assembly tests: device gather/segment-sum assembly vs an independent
scipy/numpy reference (SURVEY.md §4 'assembly vs scipy reference')."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from femo_alpha_tpu.mesh import createUnitSquareMesh
from femo_alpha_tpu.spaces import FunctionSpace
from femo_alpha_tpu.assembly import (
    FemForm,
    element_matrices,
    assemble_residual,
    make_matvec,
    CSRPattern,
)
from femo_alpha_tpu.assembly.geometry import map_gradients
from femo_alpha_tpu.solvers.direct import dense_from_elements


def _poisson_form(V, tab):
    phi = jnp.asarray(tab.phi)

    def energy(u_cell, x_cell, p):
        dphi_x, wdet = map_gradients(x_cell, tab)
        gu = jnp.einsum("qag,a->qg", dphi_x, u_cell)
        return jnp.sum(wdet * 0.5 * jnp.sum(gu * gu, axis=1))

    return FemForm(V, energy, kind="energy")


def _reference_p1_stiffness(mesh):
    """Classic hand-rolled P1 stiffness matrix (B^T B |T| per triangle)."""
    n = mesh.n_nodes
    K = sp.lil_matrix((n, n))
    for tri in mesh.conn:
        x = mesh.coords[tri]
        mat = np.array(
            [[1, x[0][0], x[0][1]], [1, x[1][0], x[1][1]], [1, x[2][0], x[2][1]]]
        )
        area = 0.5 * abs(np.linalg.det(mat))
        grads = np.linalg.inv(mat)[1:, :].T  # (3, 2) gradients of hat fns
        Ke = area * grads @ grads.T
        for a in range(3):
            for b in range(3):
                K[tri[a], tri[b]] += Ke[a, b]
    return K.tocsr()


def test_p1_stiffness_matches_reference():
    mesh = createUnitSquareMesh(5, 4, "triangle")
    V = FunctionSpace(mesh, "P", 1)
    tab = V.tabulate(quad_degree=2)
    form = _poisson_form(V, tab)
    u0 = jnp.zeros(V.n_dofs)
    Ae = element_matrices(form, u0, {})
    K_dev = np.asarray(dense_from_elements(Ae, V.dofmap_d, V.n_dofs))
    K_ref = _reference_p1_stiffness(mesh).todense()
    assert np.allclose(K_dev, K_ref, atol=1e-12)


def test_matvec_and_csr_agree_with_dense():
    mesh = createUnitSquareMesh(4, 3, "quad")
    V = FunctionSpace(mesh, "P", 2)
    tab = V.tabulate(quad_degree=4)
    form = _poisson_form(V, tab)
    u0 = jnp.zeros(V.n_dofs)
    Ae = element_matrices(form, u0, {})
    K = np.asarray(dense_from_elements(Ae, V.dofmap_d, V.n_dofs))
    x = np.random.default_rng(0).standard_normal(V.n_dofs)
    mv = make_matvec(Ae, V.dofmap_d, V.n_dofs)
    y_mf = np.asarray(mv(jnp.asarray(x)))
    assert np.allclose(y_mf, K @ x, atol=1e-11)
    pat = CSRPattern(V.dofmap, V.n_dofs)
    data = pat.assemble(Ae)
    y_csr = np.asarray(pat.matvec(data, jnp.asarray(x)))
    assert np.allclose(y_csr, K @ x, atol=1e-11)
    assert np.allclose(pat.to_dense(data), K, atol=1e-12)


def test_residual_is_gradient_of_energy():
    mesh = createUnitSquareMesh(3, 3, "triangle")
    V = FunctionSpace(mesh, "P", 1)
    tab = V.tabulate(quad_degree=2)
    form = _poisson_form(V, tab)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(V.n_dofs))
    r = np.asarray(assemble_residual(form, u, {}))
    # FD check of dE/du
    from femo_alpha_tpu.assembly.assemble import assemble_scalar

    eps = 1e-6
    for i in [0, 3, 7]:
        up = u.at[i].add(eps)
        um = u.at[i].add(-eps)
        fd = (
            float(assemble_scalar(form, up, {}))
            - float(assemble_scalar(form, um, {}))
        ) / (2 * eps)
        assert abs(fd - r[i]) < 1e-6


def test_vector_space_dofmap_interleaving():
    mesh = createUnitSquareMesh(2, 2, "triangle")
    V = FunctionSpace(mesh, "P", 1, value_size=2)
    assert V.n_dofs == 2 * mesh.n_nodes
    # cell dofs: [n0x, n0y, n1x, n1y, n2x, n2y]
    dm = V.dofmap[0]
    sm = V.scalar_dofmap[0]
    assert list(dm) == [2 * sm[0], 2 * sm[0] + 1, 2 * sm[1], 2 * sm[1] + 1,
                        2 * sm[2], 2 * sm[2] + 1]
