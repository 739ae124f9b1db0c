"""Multi-device cell-sharded assembly/solve on the 8-device CPU mesh:
sharded results must match the single-device pipeline exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.parallel.sharding import (
    ShardedAssembler,
    ShardedShellStep,
    make_device_mesh,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_shell_step_runs_and_matches_replicated():
    jmesh8 = make_device_mesh(8)
    step8 = ShardedShellStep(nx=16, ny=4, jmesh=jmesh8)
    v8, g8 = jax.jit(step8.train_step)(step8.example_thickness,
                                       step8.example_force)
    jmesh1 = make_device_mesh(1)
    step1 = ShardedShellStep(nx=16, ny=4, jmesh=jmesh1)
    v1, g1 = jax.jit(step1.train_step)(step1.example_thickness,
                                       step1.example_force)
    assert abs(float(v8) - float(v1)) < 1e-9 * max(1, abs(float(v1)))
    g8, g1 = np.asarray(g8), np.asarray(g1)
    # CG tolerance + reduction-order differences bound the agreement
    assert np.linalg.norm(g8 - g1) < 1e-6 * np.linalg.norm(g1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_residual_matches_unsharded():
    from femo_alpha_tpu.assembly.assemble import assemble_residual

    jmesh = make_device_mesh(8)
    step = ShardedShellStep(nx=8, ny=4, jmesh=jmesh)
    pde = step.pde
    nel = step.mesh.n_cells
    params = {
        "thickness": jnp.full(nel, 0.2),
        "E": jnp.full(nel, 4.32e8),
        "nu": jnp.zeros(nel),
        "uhat": jnp.zeros(pde.VU.n_dofs),
        "F_solid": step.example_force,
    }
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(pde.W.n_dofs)) * 1e-3
    asm = ShardedAssembler(step.form, jmesh)
    r_sharded = asm.residual(u, params)
    r_ref = assemble_residual(step.form, u, params)
    assert np.allclose(np.asarray(r_sharded), np.asarray(r_ref),
                       rtol=1e-9, atol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_mg_matches_single_device_mg():
    """VERDICT round-1 item 10: the multi-chip path with the geometric-MG
    preconditioner (element matrices cell-sharded per level, smoother
    matvecs distributed by the SPMD partitioner) must reproduce the
    single-device MG solve."""
    kw = dict(nx=32, ny=8, precond="mg", coarsest_cells=8)
    jmesh8 = make_device_mesh(8)
    step8 = ShardedShellStep(jmesh=jmesh8, **kw)
    assert len(step8.mg.levels) >= 3
    v8, g8 = jax.jit(step8.train_step)(step8.example_thickness,
                                       step8.example_force)
    jmesh1 = make_device_mesh(1)
    step1 = ShardedShellStep(jmesh=jmesh1, **kw)
    v1, g1 = jax.jit(step1.train_step)(step1.example_thickness,
                                       step1.example_force)
    assert abs(float(v8) - float(v1)) < 1e-9 * max(1, abs(float(v1)))
    g8, g1 = np.asarray(g8), np.asarray(g1)
    assert np.linalg.norm(g8 - g1) < 1e-6 * np.linalg.norm(g1)
    # and the preconditioned path agrees with the unpreconditioned one
    stepj = ShardedShellStep(nx=32, ny=8, jmesh=jmesh8)
    vj, gj = jax.jit(stepj.train_step)(stepj.example_thickness,
                                       stepj.example_force)
    assert abs(float(v8) - float(vj)) < 1e-8 * max(1, abs(float(vj)))
    assert np.linalg.norm(g8 - np.asarray(gj)) < (
        1e-5 * np.linalg.norm(np.asarray(gj)))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_transient_step_matches_replicated():
    """Multi-chip TRANSIENT path (implicit-midpoint scan over cell-sharded
    operators): total strain energy and its thickness gradient on the
    8-device mesh must match the single-device run."""
    from femo_alpha_tpu.parallel.sharding import ShardedPlateStep

    kw = dict(nx=8, ny=4, dt=0.01, nsteps=3)
    s8 = ShardedPlateStep(jmesh=make_device_mesh(8), **kw)
    v8, g8 = jax.jit(s8.train_step)(s8.example_thickness,
                                    s8.example_f_history)
    s1 = ShardedPlateStep(jmesh=make_device_mesh(1), **kw)
    v1, g1 = jax.jit(s1.train_step)(s1.example_thickness,
                                    s1.example_f_history)
    assert float(v1) > 0.0
    assert abs(float(v8) - float(v1)) < 1e-9 * abs(float(v1))
    g8, g1 = np.asarray(g8), np.asarray(g1)
    assert np.linalg.norm(g8 - g1) < 1e-6 * np.linalg.norm(g1)
