"""Gust-response transient on a wing shell MESH FILE (the reference's
flagship dynamic workload class, ex_gust_response_opt.py): the committed
c172-scale .msh flows through PlateSim + scan-AD adjoint on the genuinely
unstructured (shuffled) quad path, with an FD-checked gradient."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.adjoint.check import check_totals
from femo_alpha_tpu.mesh import readFEAMesh
from femo_alpha_tpu.models.dynamic_rm_shell import (
    PlateSim, StateOperation, TotalStrainEnergyOperation, VolumeOperation)

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@pytest.fixture(scope="module")
def wing_sim():
    mesh = readFEAMesh(os.path.join(DATA, "c172_like_wing_648.msh"))
    sim = PlateSim(mesh, 69e9, 0.33, 2700.0, dt=0.005, Nsteps=3,
                   element_wise_thickness=True,
                   custom_bc_func=lambda x: x[:, 1] < 1e-9, quad_deg=4)
    nn = mesh.n_nodes
    f_hist = np.zeros((sim.Nsteps + 1, nn * 3))
    for i in range(sim.Nsteps + 1):
        f = np.zeros((nn, 3))
        f[:, 2] = 800.0 * (i / sim.Nsteps)
        f_hist[i] = f.reshape(-1)
    sim.update_f_history(f_hist)
    sim.update_t(np.full(sim.num_var, 0.003))
    return sim


def test_wing_gust_forward(wing_sim):
    sim = wing_sim
    state_op = StateOperation(sim)
    tse_op = TotalStrainEnergyOperation(sim)
    vol_op = VolumeOperation(sim)
    wh = state_op.evaluate(sim.t_array)
    assert np.all(np.isfinite(np.asarray(wh)))
    E_total = float(tse_op.evaluate(wh, sim.t_array))
    assert np.isfinite(E_total) and E_total > 0.0
    # mass equals sum(h * cell_area) * rho exactly (flat-facet quads)
    vol = float(vol_op.evaluate(sim.t_array))
    assert vol > 0.0
    # wing actually deflects under the ramp load
    w_last = np.asarray(wh).reshape(sim.time_levels, -1)[-1]
    assert np.max(np.abs(w_last)) > 1e-8


def test_wing_gust_adjoint_vs_fd(wing_sim):
    sim = wing_sim
    state_op = StateOperation(sim)
    tse_op = TotalStrainEnergyOperation(sim)

    def J(p):
        t = p["t"]
        return jnp.reshape(tse_op.evaluate(state_op.evaluate(t), t), ())

    check_totals(J, {"t": sim.t_array}, eps=1e-7, directions=2, rtol=1e-5,
                 verbose=False)
