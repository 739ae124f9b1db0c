"""StateOperation: the reference's implicit-operation contract
(csdl_alpha_opt/state_operation.py:8-296) over the JAX core.

Method mapping (reference -> here):
  evaluate                 -> evaluate (returns the solved state; the JAX
                              trace plays the role of graph-node creation)
  solve_residual_equations -> solve_residual_equations (forward solve)
  compute_jacvec_product   -> compute_jacvec_product ('fwd': dR/df · df,
                              'rev': dR/df^T · lam — jax.jvp/vjp through the
                              assembled residual; replaces the hand-built
                              dRdf form zoo, :222-258. The reference's fwd
                              mode had a latent KeyError bug; both modes work
                              here.)
  apply_inverse_jacobian   -> apply_inverse_jacobian ('fwd': A du = dR,
                              'rev': A^T lam = du with BC-row zeroing,
                              :188-220)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class StateOperation:
    def __init__(self, fea, state_name, record=False):
        self.fea = fea
        self.state_name = state_name
        self.record = record
        self._pde = fea._get_pde(state_name)
        self._last = None  # (u, params, solver)

    # ------------------------------------------------------------- contract
    def evaluate(self, inputs: dict):
        return self.solve_residual_equations(inputs)

    def solve_residual_equations(self, inputs: dict):
        st = self.fea.states[self.state_name]
        params = {k: jnp.asarray(inputs[k]) for k in st.arguments}
        u = self._pde.solve(params)
        self._last = (u, params, None)
        return u

    def _solver(self):
        u, params, solver = self._last
        if solver is None:
            solver = self._pde.make_solver(u, params)
            self._last = (u, params, solver)
        return solver

    def compute_jacvec_product(self, inputs: dict, mode: str, vec):
        """'fwd': vec is d_inputs dict -> returns dR (n_dofs,).
        'rev': vec is lam (n_dofs,) -> returns d_inputs dict."""
        u, params, _ = self._last

        def r_of_p(p):
            return self._pde.residual(u, p)

        if mode == "fwd":
            tangents = {k: jnp.asarray(vec[k]) for k in params}
            _, dr = jax.jvp(r_of_p, (params,), (tangents,))
            return dr
        _, vjp = jax.vjp(r_of_p, params)
        (gp,) = vjp(self._pde.free_mask * jnp.asarray(vec))
        return gp

    def apply_inverse_jacobian(self, d_residual, mode: str):
        """'fwd': solve A du = d_residual; 'rev': solve A^T lam = d_state,
        zeroing lam at BC dofs (state_operation.py:217-218 parity)."""
        solver = self._solver()
        f = self._pde.free_mask
        if mode == "fwd":
            return solver.solve(f * jnp.asarray(d_residual))
        lam = solver.solve_transpose(f * jnp.asarray(d_residual))
        return f * lam
