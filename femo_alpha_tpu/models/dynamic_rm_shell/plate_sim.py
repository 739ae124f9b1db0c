"""PlateSim: transient Reissner-Mindlin shell with implicit-midpoint time
integration — capability parity with dynamic_rm_shell/plate_sim.py:60-602.

Scheme (plate_sim.py:133-140):
    wdot_i  = (2/dt)(w_i - w_{i-1}) - wdot_{i-1}
    wddot_i = (wdot_i - wdot_{i-1}) / dt
    residual_i = M wddot_i + K (w_i + w_{i-1})/2 - F_i = 0
For the linear shell this gives one constant operator
    A = (2/dt^2) M + K/2
per thickness, so the whole simulation is a `lax.scan` of linear solves.

TPU-native adjoint: each step's solve is a `lax.custom_linear_solve`, so
JAX reverse-mode through the scan reproduces the reference's time-reversed
adjoint sweep (state_operation_dynamic.py:447-706, 816 lines of hand-written
all-to-past coupling) automatically, in O(N_t) memory for the stored history
instead of the reference's O(N_t^2) coupling-vector matrix.

The reference's per-step `solveNonlinear_mod` runs exactly ONE Newton
iteration (nonlinear_utils.py:210-233, max_it=1), i.e. it linearizes each
step — our exact linear step solve matches that treatment.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...assembly.assemble import (
    assemble_residual,
    element_matrices,
    gather_1d,
    make_matvec,
)
from ...assembly.bc import combine_bcs, constrain_matvec, DirichletBC
from ...solvers.direct import apply_bc_dense, dense_from_elements
from ...solvers.krylov import cg_solve
from ...spaces import locate_dofs_geometric
from ...spaces.pointeval import point_eval_rows
from ..rm_shell.pde import RMShellPDE


def _default_bc(x):
    return np.abs(x[:, 0]) < 1e-6  # clamp x=0 (BC_list default)


class PlateSim:
    def __init__(
        self,
        mesh,
        E,
        nu,
        rho,
        dt,
        Nsteps,
        element_wise_thickness=False,
        custom_bc_func=None,
        add_self_weight=False,
        g_factor=None,
        quad_deg=3,
        solver_method=None,
        inner_iters=None,
        mg_coarsest_cells=64,
    ):
        self.mesh = mesh
        self.E, self.nu, self.rho = E, nu, rho
        self.dt, self.Nsteps = dt, Nsteps
        self.time_levels = Nsteps + 1
        self.nn, self.nel = mesh.n_nodes, mesh.n_cells
        self.quad_deg = quad_deg
        self.element_wise_thickness = element_wise_thickness
        self.add_self_weight = add_self_weight
        self.g_factor = g_factor

        self.pde = RMShellPDE(
            mesh,
            element_wise_material=element_wise_thickness,
            element_type="CG2CG1",
            inplane_deg=quad_deg,
            shear_deg=quad_deg,
            stress_deg=quad_deg,
        )
        self.W = self.pde.W
        self.W_t = self.pde.VT
        self.W_f = self.pde.VF
        self.fe_dofs = self.W.n_dofs
        self.num_var = self.W_t.n_dofs

        bc_func = custom_bc_func or _default_bc
        self.bc_func = bc_func
        d1 = locate_dofs_geometric(self.pde.V_disp, bc_func)
        d2 = locate_dofs_geometric(self.pde.V_rot, bc_func)
        dofs = np.concatenate([d1, d2 + self.pde.V_disp.n_dofs])
        self.free_mask, self.bc_vals = combine_bcs(
            self.fe_dofs, [DirichletBC(dofs, 0.0)]
        )

        # forms (linear: element matrices depend on thickness only)
        self.K_form = self.pde.elastic_energy_form()
        self.M_form = self.pde.inertia_form(rho_is_param=False)
        self._zero_w = jnp.zeros(self.fe_dofs)
        self._zero_uhat = jnp.zeros(self.pde.VU.n_dofs)
        nT = self.W_t.n_dofs
        self._E_field = jnp.full(nT, float(E))
        self._nu_field = jnp.full(nT, float(nu))

        n = self.fe_dofs
        on_tpu = jax.default_backend() == "tpu"
        self.mg = None
        if solver_method is None:
            if on_tpu:
                # TPU: f64 Cholesky is not implemented and the plugin
                # faults on fused f64 while_loops, so the per-step solve is
                # MG-preconditioned fixed-trip CG (geometric hierarchy when
                # the mesh supports it, Jacobi otherwise)
                solver_method = "mg"
            else:
                solver_method = "dense" if n <= 8000 else "cg"
        if solver_method == "mg":
            from .mg import build_platesim_mg

            self.mg = build_platesim_mg(
                self, coarsest_cells=mg_coarsest_cells,
                dtype=jnp.float32 if on_tpu else None)
            if self.mg is None:  # mesh not coarsenable
                solver_method = "dense" if (n <= 8000 and not on_tpu) \
                    else "cg"
        self.solver_method = solver_method
        # fixed-trip inner CG budget (chunked fori_loop, frozen once
        # converged): REQUIRED on TPU (while_loop fault), optional elsewhere
        if inner_iters is None and on_tpu:
            inner_iters = 96 if self.mg is not None else 1024
        self.inner_iters = inner_iters

        # mutable state (parity with update_t/update_f_history)
        self.t_array = jnp.full(nT, 0.1)
        self.f_history = np.zeros((self.time_levels, self.W_f.n_dofs))
        self.tip_disp_history = np.zeros(self.time_levels)
        self.opt_iter = 0
        self._tip_row = None

    # ------------------------------------------------------- parity setters
    def update_t(self, t_array):
        self.t_array = jnp.asarray(t_array).reshape(-1)

    def update_f(self, f_array):
        self.f_history[-1] = np.asarray(f_array)

    def update_f_history(self, f_history_array):
        f = np.asarray(f_history_array)
        if f.shape[0] < self.time_levels:
            pad = np.repeat(f[-1:], self.time_levels - f.shape[0], axis=0)
            f = np.concatenate([f, pad], axis=0)
        self.f_history = f[: self.time_levels]

    def update_nsteps(self, Nsteps):
        self.Nsteps = Nsteps
        self.time_levels = Nsteps + 1
        self.tip_disp_history = np.zeros(self.time_levels)
        f = self.f_history
        self.f_history = np.zeros((self.time_levels, self.W_f.n_dofs))
        n = min(len(f), self.time_levels)
        self.f_history[:n] = f[:n]
        if n < self.time_levels:
            self.f_history[n:] = f[-1]

    def set_up_tip_dofs(self, x_tip, cell_tip=None):
        """Tip z-displacement extraction row (extractTipDispDolfinx parity,
        plate_sim.py:22)."""
        (c, dofs, wts) = point_eval_rows(self.pde.V_disp, [np.asarray(x_tip)])[0]
        # z-component of the CG2 displacement at the point
        self._tip_row = (jnp.asarray(dofs * 3 + 2), jnp.asarray(wts))

    def tip_disp(self, w):
        if self._tip_row is None:
            # default: max z displacement among vertex dofs
            return jnp.max(jnp.abs(w[: 3 * self.nn].reshape(-1, 3)[:, 2]))
        idx, wts = self._tip_row
        return jnp.vdot(wts, gather_1d(w, idx))

    # ------------------------------------------------------------ operators
    def _k_params(self, t_arr):
        return {
            "thickness": t_arr,
            "E": self._E_field,
            "nu": self._nu_field,
            "uhat": self._zero_uhat,
        }

    def _element_mats(self, t_arr):
        Ke = element_matrices(self.K_form, self._zero_w, self._k_params(t_arr))
        Me = element_matrices(
            self.M_form, self._zero_w,
            {"thickness": t_arr, "rho": jnp.asarray(float(self.rho))},
        )
        spec = getattr(self, "shard_spec", None)
        if spec is not None:
            # multi-chip product path (parallel/product.py shard_model):
            # split the step operators over the cell axis; XLA's SPMD
            # partitioner then distributes every consumer — the scan-body
            # matvecs, the inner CG, and the jax.vjp element kernels of the
            # transient adjoint (reference MPI analogue:
            # fea/utils_dolfinx.py:180-186 ghost accumulation)
            Ke = spec.constrain(Ke, 0)
            Me = spec.constrain(Me, 0)
        return Ke, Me

    def assemble_load(self, f_array, t_arr=None):
        """Consistent load vector of nodal force field f (linear in f):
        the residual of the load-work energy -∫ f·u dx, negated."""
        R = self.pde._rules["inplane"]
        from ..rm_shell.pde import _interp_vec_factory
        from ..rm_shell.kinematics import surface_geometry
        from ...assembly.assemble import FemForm

        interp_f = _interp_vec_factory(self.pde.VF, R["f"].phi)
        tab_d = R["d"]
        nd2 = self.pde.nd_disp

        def load_energy(u_cell, x_cell, p):
            ud = u_cell[: nd2 * 3].reshape(nd2, 3)
            geo = surface_geometry(x_cell, tab_d.geom_dphi)
            u_q = jnp.asarray(tab_d.phi) @ ud
            f_q = interp_f(p["f"])
            return -jnp.sum(
                jnp.sum(f_q * u_q, axis=1) * R["w"] * geo["dA"])

        form = FemForm(self.W, load_energy, kind="energy",
                       param_specs={"f": self.pde.VF})
        return -assemble_residual(form, self._zero_w, {"f": f_array})

    def self_weight_vector(self, t_arr):
        g_factor = -1.0 if self.g_factor is None else self.g_factor
        form = self.pde.self_weight_load(g_factor * 9.81)
        rho_field = jnp.full(self.W_t.n_dofs, float(self.rho))
        return -assemble_residual(
            form, self._zero_w,
            {"thickness": t_arr, "density": rho_field})

    # ------------------------------------------------------------- simulate
    def simulate(self, t_arr, f_history, with_residuals=False):
        """Differentiable transient solve.

        t_arr: thickness dofs; f_history: (time_levels, n_f_dofs) nodal force
        history (row 0 unused — it is the initial condition level).
        Returns w_history (time_levels, fe_dofs); with `with_residuals=True`
        also returns the per-step relative linear-solve residuals
        (time_levels-1,) so callers can assert the fixed-trip inner CG
        actually converged in their dt/mesh/stiffness regime."""
        K_mv, M_mv, A_c, solve_A = self._solver_context(t_arr)
        dt = self.dt
        n = self.fe_dofs
        free = self.free_mask

        F_all = jax.vmap(lambda f: self.assemble_load(f))(f_history)
        if self.add_self_weight:
            F_all = F_all + self.self_weight_vector(t_arr)[None, :]

        w0 = jnp.zeros(n)
        wd0 = jnp.zeros(n)

        def step(carry, F_i):
            w_old, wdot_old = carry
            b = (
                F_i
                + (2.0 / dt**2) * M_mv(w_old)
                + (2.0 / dt) * M_mv(wdot_old)
                - 0.5 * K_mv(w_old)
            )
            b = free * b  # zero Dirichlet rows (bc values are zero)
            w = solve_A(b)
            wdot = (2.0 / dt) * (w - w_old) - wdot_old
            if with_residuals:
                # one extra matvec per step: the true relative residual of
                # the (possibly fixed-trip) linear solve — solver telemetry,
                # not part of the differentiated computation
                w_sg = jax.lax.stop_gradient(w)
                b_sg = jax.lax.stop_gradient(b)
                rrel = jnp.linalg.norm(b_sg - A_c(w_sg)) / jnp.maximum(
                    jnp.linalg.norm(b_sg), 1e-300)
                return (w, wdot), (w, rrel)
            return (w, wdot), w

        (_, _), out = jax.lax.scan(step, (w0, wd0), F_all[1:])
        if with_residuals:
            ws, rrels = out
            return jnp.concatenate([w0[None, :], ws], axis=0), rrels
        return jnp.concatenate([w0[None, :], out], axis=0)

    def _solver_context(self, t_arr):
        """Shared per-simulation solver setup: element operators, the
        constrained step operator A = (2/dt^2)M + K/2, and its
        differentiable solve (custom_linear_solve over the configured inner
        solver). Used by `simulate` and `simulate_outputs`."""
        dt = self.dt
        n = self.fe_dofs
        Ke, Me = self._element_mats(t_arr)
        dm = self.W.dofmap_d
        K_mv = make_matvec(Ke, self.W)
        M_mv = make_matvec(Me, self.W)
        free = self.free_mask

        def A_mv(x):
            return (2.0 / dt**2) * M_mv(x) + 0.5 * K_mv(x)

        A_c = constrain_matvec(A_mv, free)

        if self.solver_method == "dense":
            Ae = (2.0 / dt**2) * Me + 0.5 * Ke
            A = apply_bc_dense(
                dense_from_elements(jax.lax.stop_gradient(Ae), dm, n), free
            )
            chol = jax.scipy.linalg.cho_factor(A)  # SPD (CPU path; TPU has
            # no f64 Cholesky — see __init__ solver_method resolution)

            def inner_solve(mv, b):
                return jax.scipy.linalg.cho_solve(chol, b)
        else:
            # preconditioned CG; preconditioner built from stop_gradient'd
            # matrices (solver internals need no AD)
            if self.mg is not None:
                # V-cycle over the step operator (2/dt^2)M + K/2 — one
                # hierarchy setup per simulate(), reused by every step
                p_sg = {"thickness": jax.lax.stop_gradient(t_arr)}
                state = self.mg.setup(p_sg)
                spec = getattr(self, "shard_spec", None)
                if spec is not None:
                    from ...parallel.product import shard_mg_state

                    state = shard_mg_state(self.mg, state, spec)
                sdt = state["Ae"][0].dtype

                def Minv(v):
                    return self.mg.apply(state, v.astype(sdt)).astype(
                        v.dtype)
            else:
                Ae_sg = jax.lax.stop_gradient(
                    (2.0 / dt**2) * Me + 0.5 * Ke)
                diag = self.W.scatter_add(
                    jnp.diagonal(Ae_sg, axis1=1, axis2=2))
                diag = free * diag + (1.0 - free)
                inv = jnp.where(diag != 0, 1.0 / diag, 1.0)

                def Minv(v):
                    return inv * v

            if self.inner_iters is not None:
                # fixed-trip chunked CG (fori_loop, frozen once converged):
                # the TPU plugin faults on fused f64 while_loops, and a
                # lax.scan body cannot host-chunk — so the trip count is
                # static and convergence freezes the updates
                from ...solvers.krylov import cg_chunk_iterations

                iters = int(self.inner_iters)

                def inner_solve(mv, b):
                    target = 1e-11 * jnp.linalg.norm(b)
                    z0 = Minv(b)
                    rz0 = jnp.vdot(b, z0)
                    out = cg_chunk_iterations(
                        mv, Minv, iters, jnp.zeros_like(b), b, z0, z0,
                        rz0, target)
                    return out[0]
            else:

                def inner_solve(mv, b):
                    x, _ = cg_solve(mv, b, M=Minv, tol=1e-11,
                                    maxiter=100 * int(n**0.5))
                    return x

        def solve_A(b):
            return jax.lax.custom_linear_solve(
                A_c, b, inner_solve, symmetric=True)

        return K_mv, M_mv, A_c, solve_A

    def simulate_outputs(self, t_arr, f_history, segment_len=None,
                         with_residuals=False, stress_pnorm=None):
        """Long-horizon transient solve with ONLINE outputs: total strain
        energy, per-step scalar histories (strain energy, tip displacement),
        and the final state — WITHOUT materializing the (time_levels,
        fe_dofs) displacement history.

        The time loop runs as a two-level scan with `jax.checkpoint` on the
        inner segment, so reverse-mode memory is O(sqrt(N_t) * n) (segment
        boundary states + one recomputed segment) instead of the O(N_t * n)
        history the plain scan adjoint stores. This is the long-horizon
        scaling upgrade over the reference's transient adjoint, which keeps
        the FULL history as the operation state plus an O(N_t^2) matrix of
        coupling vectors (state_operation_dynamic.py:91-94, :610-614).

        Per-step strain energy is 0.5 w^T K w via the already-assembled
        element operator (== assemble_scalar of the quadratic energy form).
        segment_len: inner-scan length; defaults to the divisor of N_t
        nearest sqrt(N_t). stress_pnorm: optional (m, rho) — additionally
        emit the per-step p-norm stress functional (pnorm_stress_form), the
        time-resolved constraint quantity of stress-constrained gust
        optimization. Returns a dict: total_strain_energy, energy_history
        (N_t,), tip_history (N_t,), w_final, wdot_final [, res_history]
        [, pnorm_history].
        """
        K_mv, M_mv, A_c, solve_A = self._solver_context(t_arr)
        dt = self.dt
        n = self.fe_dofs
        free = self.free_mask

        F_all = jax.vmap(lambda f: self.assemble_load(f))(f_history)
        if self.add_self_weight:
            F_all = F_all + self.self_weight_vector(t_arr)[None, :]
        steps = F_all[1:]
        n_t = steps.shape[0]

        if segment_len is None:
            target = max(1, int(np.sqrt(n_t)))
            divisors = [d for d in range(1, n_t + 1) if n_t % d == 0]
            segment_len = min(divisors, key=lambda d: abs(d - target))
        if n_t % segment_len != 0:
            raise ValueError(
                f"segment_len={segment_len} must divide N_t={n_t}")
        n_seg = n_t // segment_len
        segs = steps.reshape(n_seg, segment_len, n)

        pn_form = pn_params = None
        if stress_pnorm is not None:
            m_pn, rho_pn = stress_pnorm
            pn_form = self.pde.pnorm_stress_form(m=m_pn, rho=rho_pn)
            pn_params = self._k_params(t_arr)

        def inner_step(carry, F_i):
            from ...assembly.assemble import assemble_scalar

            w_old, wdot_old = carry
            b = (
                F_i
                + (2.0 / dt**2) * M_mv(w_old)
                + (2.0 / dt) * M_mv(wdot_old)
                - 0.5 * K_mv(w_old)
            )
            b = free * b
            w = solve_A(b)
            wdot = (2.0 / dt) * (w - w_old) - wdot_old
            e_t = 0.5 * jnp.vdot(w, K_mv(w))
            outs = (e_t, self.tip_disp(w))
            if pn_form is not None:
                outs = outs + (assemble_scalar(pn_form, w, pn_params),)
            if with_residuals:
                w_sg = jax.lax.stop_gradient(w)
                b_sg = jax.lax.stop_gradient(b)
                rrel = jnp.linalg.norm(b_sg - A_c(w_sg)) / jnp.maximum(
                    jnp.linalg.norm(b_sg), 1e-300)
                outs = outs + (rrel,)
            return (w, wdot), outs

        @jax.checkpoint
        def run_segment(carry, F_seg):
            return jax.lax.scan(inner_step, carry, F_seg)

        (w_f, wd_f), outs = jax.lax.scan(
            run_segment, (jnp.zeros(n), jnp.zeros(n)), segs)
        e_hist = outs[0].reshape(n_t)
        out = {
            "total_strain_energy": jnp.sum(e_hist),
            "energy_history": e_hist,
            "tip_history": outs[1].reshape(n_t),
            "w_final": w_f,
            "wdot_final": wd_f,
        }
        idx = 2
        if pn_form is not None:
            out["pnorm_history"] = outs[idx].reshape(n_t)
            idx += 1
        if with_residuals:
            out["res_history"] = outs[idx].reshape(n_t)
        return out

    # ----------------------------------------------------- parity interface
    def SVK_residual(self):
        """Parity shim (plate_sim.py:190-215): the residual is built
        internally from the energy kernels; returns a callable
        r(w, w_old, wdot_old, t_arr, f) for inspection/testing."""
        dt = self.dt

        def residual(w, w_old, wdot_old, t_arr, f):
            Ke, Me = self._element_mats(t_arr)
            K_mv = make_matvec(Ke, self.W)
            M_mv = make_matvec(Me, self.W)
            wdot = (2.0 / dt) * (w - w_old) - wdot_old
            wddot = (wdot - wdot_old) / dt
            F = self.assemble_load(f)
            if self.add_self_weight:
                F = F + self.self_weight_vector(t_arr)
            return M_mv(wddot) + K_mv(0.5 * (w + w_old)) - F

        return residual

    def solve_dynamic_problem(self, residual=None, saving_outputs=False,
                              PATH=None, timing=False):
        """Run the transient sim with the stored thickness/force history;
        returns w_output (fe_dofs, time_levels) — reference layout
        (plate_sim.py:281-361)."""
        import time as _time

        t0 = _time.perf_counter()
        wh, rrels = self.simulate(self.t_array, jnp.asarray(self.f_history),
                                  with_residuals=True)
        wh = jax.block_until_ready(wh)
        self.w_history = wh
        # per-step relative residual of the linear solves (telemetry for the
        # fixed-trip inner CG — ADVICE r1: surface it so silent accuracy
        # loss outside the tested dt/mesh regimes is visible)
        self.step_residual_history = np.asarray(rrels)
        max_rrel = float(np.max(self.step_residual_history))
        if max_rrel > 1e-6:
            import warnings

            warnings.warn(
                f"transient step solver: max relative residual {max_rrel:.3e}"
                " exceeds 1e-6 — increase inner_iters or refine the"
                " preconditioner", stacklevel=2)
        self.tip_disp_history = np.asarray(
            jax.vmap(self.tip_disp)(wh))
        if timing:
            print(f"Dynamic simulation wall time: {_time.perf_counter()-t0}")
        if saving_outputs:
            PATH = PATH or "solutions/"
            import os

            os.makedirs(PATH + "records", exist_ok=True)
            np.save(
                PATH + f"records/strain_energy_opt_{self.opt_iter}",
                np.asarray(self.strain_energy_history(wh, self.t_array)),
            )
            np.save(
                PATH + f"records/tip_disp_opt_{self.opt_iter}",
                self.tip_disp_history,
            )
            self.opt_iter += 1
        return np.asarray(wh).T

    # ------------------------------------------------------------- outputs
    def strain_energy(self, w, t_arr):
        from ...assembly.assemble import assemble_scalar

        return assemble_scalar(self.K_form, w, self._k_params(t_arr))

    def strain_energy_history(self, w_history, t_arr):
        return jax.vmap(lambda w: self.strain_energy(w, t_arr))(w_history)

    def assembleStrainEnergy(self, w):
        return float(self.strain_energy(jnp.asarray(w), self.t_array))

    def volume(self, t_arr):
        from ...assembly.assemble import assemble_scalar

        form = self.pde.volume_form()
        return assemble_scalar(form, t_arr, {"uhat": self._zero_uhat})

    def pnorm_stress(self, w, t_arr, m=1e-6, rho=100):
        from ...assembly.assemble import assemble_scalar

        form = self.pde.pnorm_stress_form(m=m, rho=rho)
        params = {k: v for k, v in self._k_params(t_arr).items()}
        return assemble_scalar(form, w, params)

    def von_Mises_stress(self, w, t_arr):
        project, _ = self.pde.von_mises_dg1_projection()
        return project(w, self._k_params(t_arr))
