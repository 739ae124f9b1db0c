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


def test_linear_solver_lane_matches_cells():
    """LinearSolver(op0_layout='lane'): solve, transpose solve, and the
    Jacobi preconditioner all match the cell-major path (the library solve
    path on TPU runs lane-major since round 2)."""
    from femo_alpha_tpu.solvers.linear import LinearSolver

    mesh, pde, params = _shell()
    W = pde.W
    form = pde.make_residual_form()
    Ae = element_matrices(form, jnp.zeros(W.n_dofs), params)
    # shift by a cell-wise identity: the raw shell operator with a few
    # arbitrary constrained dofs retains rigid-body modes, and CG on a
    # (near-)singular system amplifies path-dependent rounding into
    # arbitrarily different "solutions" — the comparison needs an SPD system
    shift = 1e-3 * float(jnp.mean(jnp.abs(jnp.diagonal(
        Ae, axis1=1, axis2=2))))
    Ae = Ae + shift * jnp.eye(Ae.shape[1], dtype=Ae.dtype)[None]
    free = jnp.ones(W.n_dofs).at[:12].set(0.0)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(W.n_dofs))
    kw = dict(free_mask=free, method="cg", tol=1e-12)
    s_cm = LinearSolver([(Ae, W)], W.n_dofs, **kw)
    s_ln = LinearSolver([(jnp.moveaxis(Ae, 0, -1), W)], W.n_dofs,
                        op0_layout="lane", **kw)
    rng_v = jnp.asarray(rng.standard_normal(W.n_dofs))
    np.testing.assert_allclose(np.asarray(s_ln.matvec(rng_v)),
                               np.asarray(s_cm.matvec(rng_v)),
                               rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s_ln.M(rng_v)),
                               np.asarray(s_cm.M(rng_v)),
                               rtol=1e-12, atol=1e-14)
    x_cm = s_cm.solve(b)
    x_ln = s_ln.solve(b)
    scale = float(jnp.max(jnp.abs(x_cm)))
    np.testing.assert_allclose(np.asarray(x_ln), np.asarray(x_cm),
                               rtol=1e-8, atol=1e-8 * scale)
    xt_cm = s_cm.solve_transpose(b)
    xt_ln = s_ln.solve_transpose(b)
    np.testing.assert_allclose(np.asarray(xt_ln), np.asarray(xt_cm),
                               rtol=1e-8, atol=1e-8 * scale)
    # dense path accepts lane-major ops too (converts internally)
    s_dn = LinearSolver([(jnp.moveaxis(Ae, 0, -1), W)], W.n_dofs,
                        op0_layout="lane", free_mask=free, method="dense")
    np.testing.assert_allclose(np.asarray(s_dn.solve(b)), np.asarray(x_cm),
                               rtol=1e-8, atol=1e-8 * scale)


def test_model_library_lane_matches_cells(monkeypatch):
    """RMShellModel through the lane-major library path (FEMO_LANE_MAJOR=1:
    lane-major affine fine operator + lane-major MG hierarchy + op0_layout
    solver wiring — what TPU gets by default) reproduces the cell-major
    path's solution and thickness gradient."""
    from femo_alpha_tpu.mesh import createRectangleMesh
    from femo_alpha_tpu.models import RMShellModel

    def build(lane):
        monkeypatch.setenv("FEMO_LANE_MAJOR", "1" if lane else "0")
        mesh = createRectangleMesh(64, 16, (0, 0), (10.0, 2.0), "quad",
                                   gdim=3)
        return RMShellModel(mesh, shell_bc_func=lambda x: x[:, 0] < 1e-12,
                            element_wise_material=True, PENALTY_BC=False)

    m_ln = build(True)
    op = m_ln.fea.states["disp_solid"].pde
    assert op.solver_opts.get("op0_layout") == "lane"
    m_cm = build(False)
    assert "op0_layout" not in m_cm.fea.states[
        "disp_solid"].pde.solver_opts

    nel = m_ln.mesh.n_cells
    nn = m_ln.mesh.n_nodes
    f = jnp.zeros(3 * nn).at[2::3].set(2.0)
    E = jnp.full(nel, 4.32e8)
    nu = jnp.zeros(nel)
    rho = jnp.full(nel, 100.0)
    th = jnp.full(nel, 0.2) * (
        1.0 + 0.05 * jnp.cos(jnp.arange(nel, dtype=jnp.float64)))

    def J(model, th):
        out = model.evaluate(f, th, E, nu, rho, is_pressure=True)
        return out.compliance, out.disp_solid

    (J_l, u_l), g_l = jax.value_and_grad(
        lambda t: J(m_ln, t), has_aux=True)(th)
    (J_c, u_c), g_c = jax.value_and_grad(
        lambda t: J(m_cm, t), has_aux=True)(th)
    assert abs(float(J_l) - float(J_c)) <= 1e-8 * abs(float(J_c))
    np.testing.assert_allclose(np.asarray(u_l), np.asarray(u_c),
                               rtol=1e-7, atol=1e-9 * float(
                                   jnp.max(jnp.abs(u_c))))
    np.testing.assert_allclose(np.asarray(g_l), np.asarray(g_c), rtol=1e-6,
                               atol=1e-8 * float(jnp.max(jnp.abs(g_c))))
