"""Dynamic-shell operation layer — API parity with the reference's csdl
operations (state_operation_dynamic.py:20, total_strain_energy_operation.py:19,
volume_operation.py:20), re-expressed as plain differentiable functions.

The reference's dynamic StateOperation hand-implements the block-bidiagonal
Jacobian products and the O(N_t^2) time-reversed adjoint sweep; here
`evaluate` simply calls PlateSim.simulate (a lax.scan of
custom_linear_solve steps), and jax.grad of any downstream scalar reproduces
those sweeps automatically. gradient_mode is accepted for signature parity
and ignored.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class StateOperation:
    """state = full displacement history, shape (time_levels * fe_dofs,),
    time-major (equivalent to the reference's Fortran-flattened
    fe_dofs x time_levels array, state_operation_dynamic.py:91-94)."""

    def __init__(self, plate_sim, gradient_mode="jax", record=False,
                 path=None):
        self.plate_sim = plate_sim
        self.gradient_mode = gradient_mode
        self.record = record
        self.path = path

    def evaluate(self, thickness, f_history=None):
        sim = self.plate_sim
        fh = (
            jnp.asarray(sim.f_history)
            if f_history is None
            else jnp.asarray(f_history)
        )
        wh = sim.simulate(jnp.asarray(thickness), fh)
        return wh.reshape(-1)


class TotalStrainEnergyOperation:
    """sum_t strain_energy(w_t) (+ optional thickness regularization scaled
    by the step count — total_strain_energy_operation.py:56-138)."""

    def __init__(self, plate_sim, regularization=None, alpha=1e-2):
        self.plate_sim = plate_sim
        self.regularization = regularization
        self.alpha = alpha

    def evaluate(self, disp_history, thickness):
        sim = self.plate_sim
        wh = jnp.asarray(disp_history).reshape(sim.time_levels, sim.fe_dofs)
        t = jnp.asarray(thickness)
        total = jnp.sum(sim.strain_energy_history(wh, t))
        if self.regularization is not None:
            from ...assembly.assemble import FemForm, assemble_scalar

            kern = sim.pde.regularization_kernel(self.regularization)
            form = FemForm(sim.pde.VT, lambda u, x, p: kern(
                None, x, {"thickness": p["thickness"]}),
                kind="energy", param_specs={"thickness": sim.pde.VT})
            # scaled by number of time steps (reference :132-138)
            total = total + sim.Nsteps * assemble_scalar(
                form, t, {"thickness": t})
        return total


class VolumeOperation:
    """V = ∫ t dx and dV/dt (volume_operation.py:57-70)."""

    def __init__(self, plate_sim):
        self.plate_sim = plate_sim

    def evaluate(self, thickness):
        return self.plate_sim.volume(jnp.asarray(thickness))
