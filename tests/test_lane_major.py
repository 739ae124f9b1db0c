"""Lane-major (nd, nd, nc) element-data layout: equivalence with the
cell-major path for gather/scatter, matvec, smoothers, and the full bench."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.assembly.assemble import (
    element_matrices,
    make_matvec,
    make_matvec_T,
)
from femo_alpha_tpu.benchmarks import ShellBench
from femo_alpha_tpu.mesh import StructuredQuadMesh
from femo_alpha_tpu.models.rm_shell.pde import RMShellPDE
from femo_alpha_tpu.spaces import FunctionSpace


def _shell(nx=6, ny=4):
    mesh = StructuredQuadMesh(nx, ny, (0, 0), (10.0, 2.0), gdim=3)
    pde = RMShellPDE(mesh, element_wise_material=True, inplane_deg=2,
                     shear_deg=2, stress_deg=2)
    nel = mesh.n_cells
    params = {"thickness": jnp.full(nel, 0.2),
              "E": jnp.full(nel, 4.32e8), "nu": jnp.full(nel, 0.3),
              "uhat": jnp.zeros(pde.VU.n_dofs),
              "F_solid": jnp.zeros(pde.VF.n_dofs)}
    return mesh, pde, params


@pytest.mark.parametrize("family,degree,vs", [
    ("P", 1, 1), ("P", 1, 3), ("P", 2, 3), ("DG", 0, 1), ("DG", 1, 2),
])
def test_gather_T_matches_gather(family, degree, vs):
    mesh = StructuredQuadMesh(5, 3, (0, 0), (1.0, 1.0), gdim=3)
    V = FunctionSpace(mesh, family, degree, value_size=vs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(V.n_dofs))
    np.testing.assert_allclose(np.asarray(V.gather_T(x)),
                               np.asarray(V.gather(x)).T, rtol=0, atol=0)
    # scatter_add_T is the exact adjoint of gather_T
    cvT = jnp.asarray(rng.standard_normal(V.gather_T(x).shape))
    lhs = float(jnp.vdot(V.gather_T(x), cvT))
    rhs = float(jnp.vdot(x, V.scatter_add_T(cvT)))
    assert abs(lhs - rhs) < 1e-12 * max(abs(lhs), 1.0)
    np.testing.assert_allclose(np.asarray(V.scatter_add_T(cvT)),
                               np.asarray(V.scatter_add(cvT.T)),
                               rtol=1e-14, atol=1e-14)


def test_mixed_gather_T_and_matvec_T():
    mesh, pde, params = _shell()
    W = pde.W
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(W.n_dofs))
    np.testing.assert_allclose(np.asarray(W.gather_T(x)),
                               np.asarray(W.gather(x)).T, rtol=0, atol=0)
    form = pde.make_residual_form()
    u0 = jnp.zeros(W.n_dofs)
    Ae = element_matrices(form, u0, params)
    Ae_T = jnp.moveaxis(Ae, 0, -1)
    y_cm = make_matvec(Ae, W)(x)
    y_ln = make_matvec_T(Ae_T, W)(x)
    np.testing.assert_allclose(np.asarray(y_ln), np.asarray(y_cm),
                               rtol=1e-12, atol=1e-12 * float(
                                   jnp.max(jnp.abs(y_cm))))


@pytest.mark.parametrize("smoother", ["block_jacobi", "schwarz"])
def test_lane_major_smoother_apply(smoother):
    from femo_alpha_tpu.solvers.multigrid import (
        apply_block_jacobi,
        apply_block_jacobi_T,
        apply_schwarz,
        apply_schwarz_T,
        block_jacobi_arrays,
        schwarz_arrays,
    )

    mesh, pde, params = _shell()
    W = pde.W
    form = pde.make_residual_form()
    Ae = element_matrices(form, jnp.zeros(W.n_dofs), params)
    free = jnp.ones(W.n_dofs).at[:12].set(0.0)
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal(W.n_dofs))
    if smoother == "block_jacobi":
        Ds = block_jacobi_arrays(Ae, W, free)
        y_cm = apply_block_jacobi(W, Ds, v)
        y_ln = apply_block_jacobi_T(W, [jnp.moveaxis(D, 0, -1) for D in Ds],
                                    v)
    else:
        inv, sw = schwarz_arrays(Ae, W, free)
        y_cm = apply_schwarz(W, inv, sw, v)
        y_ln = apply_schwarz_T(W, jnp.moveaxis(inv, 0, -1), sw.T, v)
    np.testing.assert_allclose(np.asarray(y_ln), np.asarray(y_cm),
                               rtol=1e-11, atol=1e-11 * float(
                                   jnp.max(jnp.abs(y_cm))))


def test_bench_lane_major_matches_cell_major():
    kw = dict(nx=16, ny=8, cg_tol=1e-11, mode="f64", precond="mg",
              coarsest_cells=32)
    # lane_major defaults to backend=="tpu"; force it on to test the
    # lane-major code path on the CPU test platform
    b_ln = ShellBench(affine=True, lane_major=True, **kw)
    b_cm = ShellBench(affine=False, **kw)  # direct assembly, cell-major
    assert b_ln.lane_major and not b_cm.lane_major
    th = b_ln.th0 * (1.0 + 0.1 * jnp.cos(jnp.arange(b_ln.mesh.n_cells)))
    out_l = b_ln.forward_adjoint(th)
    out_c = b_cm.forward_adjoint(th)
    assert abs(float(out_l["J"]) - float(out_c["J"])) <= 1e-9 * abs(
        float(out_c["J"]))
    np.testing.assert_allclose(np.asarray(out_l["grad"]),
                               np.asarray(out_c["grad"]), rtol=1e-6)
