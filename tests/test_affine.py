"""Affine design-operator decomposition (assembly/affine.py): exactness vs
direct assembly, closed-form design vjp vs jax.vjp, and bench-path
equivalence (affine on/off give identical J/grad)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.assembly.affine import AffineDesignOperator
from femo_alpha_tpu.assembly.assemble import (
    assemble_residual,
    element_matrices,
)
from femo_alpha_tpu.benchmarks import ShellBench
from femo_alpha_tpu.mesh import StructuredQuadMesh
from femo_alpha_tpu.models.rm_shell.pde import RMShellPDE


def _setup(nx=6, ny=4):
    mesh = StructuredQuadMesh(nx, ny, (0, 0), (10.0, 2.0), gdim=3)
    pde = RMShellPDE(mesh, element_wise_material=True, inplane_deg=2,
                     shear_deg=2, stress_deg=2)
    form = pde.make_residual_form()
    nel = mesh.n_cells
    fvec = jnp.zeros(pde.VF.n_dofs).at[2::3].set(2.0)

    def params_of(th):
        return {"thickness": th, "E": jnp.full(nel, 4.32e8),
                "nu": jnp.full(nel, 0.3),
                "uhat": jnp.zeros(pde.VU.n_dofs), "F_solid": fvec}

    return pde, form, params_of


def test_affine_matches_direct_assembly():
    pde, form, params_of = _setup()
    u0 = jnp.zeros(pde.W.n_dofs)
    aff = AffineDesignOperator(form, u0, params_of, powers=(1, 3),
                               probe_scale=0.2)
    rng = np.random.default_rng(0)
    th = jnp.asarray(0.05 + 0.3 * rng.random(pde.mesh.n_cells))
    rel = aff.verify(th, u0, params_of)
    assert rel < 1e-10


def test_affine_load_is_design_independent():
    pde, form, params_of = _setup()
    u0 = jnp.zeros(pde.W.n_dofs)
    F1 = -assemble_residual(form, u0, params_of(
        jnp.full(pde.mesh.n_cells, 0.1)))
    F2 = -assemble_residual(form, u0, params_of(
        jnp.full(pde.mesh.n_cells, 0.7)))
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F2),
                               rtol=0, atol=1e-12)


def test_affine_vjp_theta_matches_ad():
    pde, form, params_of = _setup()
    u0 = jnp.zeros(pde.W.n_dofs)
    aff = AffineDesignOperator(form, u0, params_of, powers=(1, 3),
                               probe_scale=0.2)
    rng = np.random.default_rng(1)
    th = jnp.asarray(0.05 + 0.3 * rng.random(pde.mesh.n_cells))
    u = jnp.asarray(rng.standard_normal(pde.W.n_dofs))
    lam = jnp.asarray(rng.standard_normal(pde.W.n_dofs))

    def r_of_th(th_):
        return assemble_residual(form, u, params_of(th_))

    _, vjp = jax.vjp(r_of_th, th)
    (g_ad,) = vjp(lam)
    g_aff = aff.vjp_theta(th, u, lam, pde.W)
    np.testing.assert_allclose(np.asarray(g_aff), np.asarray(g_ad),
                               rtol=1e-8, atol=1e-10 * float(
                                   jnp.max(jnp.abs(g_ad))))


def test_affine_rejects_nonpolynomial_dependence():
    # CG1 nodal thickness: Ae is NOT a per-cell polynomial of one scalar
    mesh = StructuredQuadMesh(4, 2, (0, 0), (10.0, 2.0), gdim=3)
    pde = RMShellPDE(mesh, element_wise_material=False, inplane_deg=2,
                     shear_deg=2, stress_deg=2)
    form = pde.make_residual_form()

    def params_of(th):
        # nodal thickness of the right size but NOT cellwise-constant probes
        n = pde.VT.n_dofs
        base = jnp.linspace(0.1, 0.5, n)
        t = th[0] if th.shape[0] != n else th
        return {"thickness": base * (1.0 + t),
                "E": jnp.full(pde.VT.n_dofs, 4.32e8),
                "nu": jnp.full(pde.VT.n_dofs, 0.3),
                "uhat": jnp.zeros(pde.VU.n_dofs),
                "F_solid": jnp.zeros(pde.VF.n_dofs)}

    u0 = jnp.zeros(pde.W.n_dofs)
    aff = AffineDesignOperator(form, u0, params_of, powers=(1, 3),
                               probe_scale=0.2)
    with pytest.raises(ValueError):
        aff.verify(jnp.full(mesh.n_cells, 0.33), u0, params_of)


@pytest.mark.parametrize("precond", ["mg", "jacobi"])
def test_bench_affine_matches_direct(precond):
    kw = dict(nx=16, ny=8, cg_tol=1e-11, mode="f64", precond=precond,
              coarsest_cells=32)
    b_aff = ShellBench(affine=True, **kw)
    b_dir = ShellBench(affine=False, **kw)
    th = b_aff.th0 * (1.0 + 0.2 * jnp.sin(jnp.arange(b_aff.mesh.n_cells)))
    out_a = b_aff.forward_adjoint(th)
    out_d = b_dir.forward_adjoint(th)
    assert abs(float(out_a["J"]) - float(out_d["J"])) <= 1e-9 * abs(
        float(out_d["J"]))
    np.testing.assert_allclose(np.asarray(out_a["grad"]),
                               np.asarray(out_d["grad"]), rtol=1e-6)


def test_df_storage_combine_matches_plain():
    """storage='df' (float-float basis pair + native-f32 combine — the TPU
    re-assembly fast path) must reproduce the plain-f64 combine to
    float-float precision in both layouts."""
    import jax.numpy as jnp

    from femo_alpha_tpu.mesh import createRectangleMesh
    from femo_alpha_tpu.models.rm_shell.pde import RMShellPDE
    from femo_alpha_tpu.assembly.affine import CachedAffineAssembler

    mesh = createRectangleMesh(8, 4, (0, 0), (10.0, 2.0), "quad", gdim=3)
    pde = RMShellPDE(mesh, element_wise_material=True)
    form = pde.make_residual_form()
    nel, nn = mesh.n_cells, mesh.n_nodes
    params = {"thickness": jnp.full(nel, 0.2) * (1 + 0.1 * jnp.arange(nel) / nel),
              "E": jnp.full(nel, 4.32e8), "nu": jnp.full(nel, 0.1),
              "uhat": jnp.zeros(3 * nn), "F_solid": jnp.zeros(3 * nn)}
    u0 = jnp.zeros(pde.W.n_dofs)
    for lay in ["cells", "lane"]:
        a_df = CachedAffineAssembler(form, layout=lay, out_layout=lay,
                                     storage="df")
        a_pl = CachedAffineAssembler(form, layout=lay, out_layout=lay)
        Ae_df = a_df(u0, params)
        Ae_pl = a_pl(u0, params)
        err = float(jnp.max(jnp.abs(Ae_df - Ae_pl))
                    / jnp.max(jnp.abs(Ae_pl)))
        assert err < 1e-12, (lay, err)
