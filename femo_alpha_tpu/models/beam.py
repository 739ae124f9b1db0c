"""Euler–Bernoulli cantilever beam with Hermite cubic elements.

Capability parity with the reference beam example
(examples/basic_examples/beam_thickness_opt/ex_thickness_opt_cantilever_beam.py):
residual ∫ (∇²v)·EI(t)·∇²u dx − f·v|tip with EI = E·b·t³/12, DG0 thickness
design field, clamped (value+slope) root, compliance + volume outputs, SLSQP
thickness optimization. Anchor: optimized compliance 23762.1537
(docs/src/getting_started.md:57-67).

TPU-native notes: the Hermite dof transform (slope dofs scale with the cell
length h) is applied inside the cell kernel, so the tabulated reference
tables stay static; the element energy is differentiated by jax.grad to give
the residual and by jax.jacfwd for the element stiffness.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..assembly.assemble import FemForm
from ..fea import FEA, FEAModel
from ..mesh import createIntervalMesh
from ..spaces import FunctionSpace


class EulerBernoulliBeamModel:
    def __init__(self, nel=50, L=1.0, E=1.0, width=0.1, tip_load=-1.0,
                 solver="dense"):
        self.L, self.E, self.width = L, E, width
        self.mesh = createIntervalMesh(nel, 0.0, L)
        self.V = FunctionSpace(self.mesh, "Hermite", 3)
        self.T = FunctionSpace(self.mesh, "DG", 0)
        tab = self.V.tabulate(quad_degree=6, with_hessian=True)
        d2phi = jnp.asarray(tab.d2phi[:, :, 0, 0])  # (nq, 4)
        w = jnp.asarray(tab.weights)
        Ec, b = E, width

        def energy(u_cell, x_cell, p):
            h = x_cell[1, 0] - x_cell[0, 0]
            # Hermite dof transform: physical slope dofs enter scaled by h
            scale = jnp.stack([1.0 + 0 * h, h, 1.0 + 0 * h, h])
            c = u_cell * scale
            t = p["thickness"][0]
            EI = Ec * b * t**3 / 12.0
            upp = (d2phi @ c) / h**2  # physical second derivative at quads
            return jnp.sum(w * h * 0.5 * EI * upp**2)

        form = FemForm(self.V, energy, kind="energy",
                       param_specs={"thickness": self.T})

        # tip point load: value dof of the last node (x = L)
        tip_dof = self.V.n_dofs - 2
        F = jnp.zeros(self.V.n_dofs).at[tip_dof].set(tip_load)
        self._F = F

        fea = FEA(self.mesh)
        fea.add_input("thickness", self.T)
        fea.add_state(
            "displacements",
            form,
            arguments=["thickness"],
            extra_residual=lambda u, p: -F,
            solver_opts={"method": solver, "tol": 1e-14},
        )
        # clamped root: value+slope dofs at node 0 (x=0)
        fea.add_strong_bc(np.array([0, 1], dtype=np.int32), 0.0)
        # compliance = f·u(tip) (ex_..._beam.py:66-67)
        fea.add_output(
            "compliance", fn=lambda vals: jnp.vdot(F, vals["displacements"])
        )
        # volume = ∫ t·b·L dx (ex_..._beam.py:64: t*width*L*dx)
        h_cells = jnp.asarray(np.diff(self.mesh.coords[:, 0]))
        fea.add_output(
            "volume",
            fn=lambda vals: jnp.sum(vals["thickness"] * h_cells) * b * L,
        )
        self.fea = fea
        self.model = FEAModel(fea=[fea])

    def evaluate(self, thickness):
        return self.model.evaluate({"thickness": jnp.asarray(thickness)})
