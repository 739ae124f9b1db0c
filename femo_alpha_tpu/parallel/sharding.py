"""Multi-chip domain decomposition: cell-batch sharding over a device mesh.

The reference distributes via MPI + PETSc ghosted index maps
(SURVEY.md §2.3); the TPU-native equivalent is SPMD cell-batch sharding:
every device owns a contiguous slab of cells, gathers the (replicated) dof
vector, computes its element kernels locally, scatter-adds into a full-length
partial vector, and a `psum` over the mesh axis produces the assembled
result — the collective rides ICI. Dof vectors stay replicated (the FEM
analogue of data parallelism; no TP/PP analogue exists in this workload,
SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as JaxMesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..assembly.assemble import FemForm, gather_dofs
from ..assembly.bc import combine_bcs, constrain_matvec, DirichletBC
from ..solvers.krylov import cg_solve


def make_device_mesh(n_devices=None, axis="cells"):
    devs = jax.devices()
    n = n_devices or len(devs)
    return JaxMesh(np.array(devs[:n]), (axis,))


class ShardedAssembler:
    """Sharded residual / element-matrix / matvec for one FemForm.

    Cell count must be divisible by the mesh axis size (pad meshes at
    construction time if needed)."""

    def __init__(self, form: FemForm, jmesh: JaxMesh, axis="cells"):
        self.form = form
        self.jmesh = jmesh
        self.axis = axis
        nc = form.space.dofmap_d.shape[0]
        nd = jmesh.shape[axis]
        assert nc % nd == 0, f"{nc} cells not divisible by {nd} devices"
        self.n_dofs = form.space.n_dofs
        # gathered-param name order (static)
        self.gathered = [k for k, sp in form.param_specs.items()
                         if sp is not None]
        self.scalar = [k for k, sp in form.param_specs.items() if sp is None]

    def _cell_args(self, params):
        """(dofmap, cell_coords, *param_dofmaps) — everything cell-indexed."""
        sp = self.form.space
        args = [sp.dofmap_d, sp.cell_coords_d]
        for k in self.gathered:
            args.append(self.form.param_specs[k].dofmap_d)
        return args

    def _kernel_batch(self, fn, u, params, dm, xc, *pdms):
        uc = gather_dofs(u, dm)
        pc = {}
        axes = {}
        for k, pdm in zip(self.gathered, pdms):
            pc[k] = gather_dofs(jnp.asarray(params[k]), pdm)
            axes[k] = 0
        for k in self.scalar:
            pc[k] = params[k]
            axes[k] = None
        return jax.vmap(fn, in_axes=(0, 0, axes))(uc, xc, pc)

    def residual(self, u, params):
        mesh, ax = self.jmesh, self.axis
        n = self.n_dofs
        cell_in = tuple([P(ax)] * (2 + len(self.gathered)))

        @jax.jit
        def run(u, params, *cell_args):
            def local(u, params, *ca):
                rc = self._kernel_batch(self.form.kernel, u, params, *ca)
                partial = jax.ops.segment_sum(
                    rc.reshape(-1), ca[0].reshape(-1), num_segments=n
                )
                return jax.lax.psum(partial, ax)

            return shard_map(
                local,
                mesh=mesh,
                in_specs=(P(), jax.tree.map(lambda _: P(), params))
                + cell_in,
                out_specs=P(),
            )(u, params, *cell_args)

        return run(u, params, *self._cell_args(params))

    def make_matvec(self, u, params):
        """Sharded matrix-free operator from per-shard element matrices,
        computed once (linear problems) and kept SHARDED across devices."""
        mesh, ax = self.jmesh, self.axis
        n = self.n_dofs
        jacfn = jax.jacfwd(self.form.kernel, argnums=0)
        cell_in = tuple([P(ax)] * (2 + len(self.gathered)))

        def build(u, params, *cell_args):
            def local(u, params, *ca):
                return self._kernel_batch(jacfn, u, params, *ca)

            return shard_map(
                local,
                mesh=mesh,
                in_specs=(P(), jax.tree.map(lambda _: P(), params))
                + cell_in,
                out_specs=P(ax),
            )(u, params, *cell_args)

        cell_args = self._cell_args(params)
        Ae = build(u, params, *cell_args)
        dm = self.form.space.dofmap_d

        def matvec(x):
            def local(x, Ae, dm_l):
                from ..assembly.assemble import cell_matvec

                xc = gather_dofs(x, dm_l)
                yc = cell_matvec(Ae, xc)
                partial = jax.ops.segment_sum(
                    yc.reshape(-1), dm_l.reshape(-1), num_segments=n
                )
                return jax.lax.psum(partial, ax)

            return shard_map(
                local, mesh=mesh,
                in_specs=(P(), P(ax), P(ax)), out_specs=P(),
            )(x, Ae, dm)

        return matvec


class ShardedShellStep:
    """The multi-chip 'training step': forward RM-shell solve + adjoint
    gradient of compliance w.r.t. thickness, cell-sharded over a device mesh.

    Linear shell => the solve is one jax.lax.custom_linear_solve (CG inner),
    so jax.value_and_grad differentiates through it with a transposed solve —
    the same forward+adjoint pair as the reference optimizer iteration
    (SURVEY.md §3.1-3.2), now SPMD.

    precond='mg' gives the sharded CG the geometric-MG V-cycle: every
    level's element matrices carry a NamedSharding over the cell axis, so
    XLA's SPMD partitioner distributes the smoother/residual matvecs
    (gather -> cell matvec -> scatter-add -> all-reduce over ICI) while dof
    vectors stay replicated; levels too small to shard evenly (and the
    dense coarse inverse) are replicated — redundant compute, zero comm.
    This makes multi-chip a perf story (MUMPS-parity MG per chip count),
    not just a correctness demo."""

    def __init__(self, nx=8, ny=4, jmesh=None, bc_func=None,
                 precond="jacobi", coarsest_cells=8):
        from ..mesh import createRectangleMesh
        from ..models.rm_shell.pde import RMShellPDE
        from ..spaces import locate_dofs_geometric

        self.jmesh = jmesh or make_device_mesh()
        mesh = createRectangleMesh(nx, ny, (0, 0), (10.0, 2.0), "quad",
                                   gdim=3)
        self.mesh = mesh
        pde = self.pde = RMShellPDE(mesh, element_wise_material=True,
                                    inplane_deg=2, shear_deg=2, stress_deg=2)
        bc_func = bc_func or (lambda x: x[:, 0] < 1e-12)
        d1 = locate_dofs_geometric(pde.V_disp, bc_func)
        d2 = locate_dofs_geometric(pde.V_rot, bc_func)
        dofs = np.concatenate([d1, d2 + pde.V_disp.n_dofs])
        self.free_mask, _ = combine_bcs(pde.W.n_dofs, [DirichletBC(dofs, 0.0)])
        self.form = pde.make_residual_form()
        self.asm = ShardedAssembler(self.form, self.jmesh)
        self.n = pde.W.n_dofs
        self.mg = None
        if precond == "mg":
            from ..models.rm_shell.mg import build_shell_mg

            self.mg = build_shell_mg(pde, bc_func,
                                     coarsest_cells=coarsest_cells)
            assert self.mg is not None, (
                "mesh cannot build an MG hierarchy (odd dims or below "
                f"coarsest_cells={coarsest_cells})")
        nT = pde.VT.n_dofs
        self.example_thickness = jnp.full(nT, 0.2)
        f = np.zeros((mesh.n_nodes, 3))
        f[:, 2] = 2.0
        self.example_force = jnp.asarray(f.reshape(-1))

    def _shard_mg_state(self, state):
        """Cell-shard each level's element matrices (cell-major (nc, nd, nd))
        when the level is large enough to split evenly; the rest replicate."""
        from jax.sharding import NamedSharding

        ndev = self.jmesh.shape[self.axis_name]
        shard = NamedSharding(self.jmesh, P(self.axis_name))
        repl = NamedSharding(self.jmesh, P())

        def constrain(a, spec):
            return jax.lax.with_sharding_constraint(a, spec)

        out = dict(state)
        out["Ae"] = [
            constrain(Ae, shard)
            if (Ae.shape[0] % ndev == 0 and Ae.shape[0] >= 2 * ndev)
            else constrain(Ae, repl)
            for Ae in state["Ae"]
        ]
        return out

    @property
    def axis_name(self):
        return self.asm.axis

    def _solve(self, thickness, force):
        params = {
            "thickness": thickness,
            "E": jnp.full_like(thickness, 4.32e8),
            "nu": jnp.zeros_like(thickness),
            "uhat": jnp.zeros(self.pde.VU.n_dofs),
            "F_solid": force,
        }
        u0 = jnp.zeros(self.n)
        free = self.free_mask
        b = -self.asm.residual(u0, params)
        b = free * b
        mv = self.asm.make_matvec(u0, params)
        mv_c = constrain_matvec(mv, free)

        M = None
        if self.mg is not None:
            # stop_gradient: the V-cycle state steers CG iterations but must
            # not join the differentiation (custom_linear_solve closes over
            # the solve fn; the preconditioner is mathematically irrelevant
            # to the solution the IFT differentiates)
            state = jax.lax.stop_gradient(
                self._shard_mg_state(self.mg.setup(params)))
            M = lambda v: self.mg.apply(state, v)  # noqa: E731

        def inner(op, rhs):
            x, _ = cg_solve(op, rhs, M=M, tol=1e-10,
                            maxiter=200 if M is not None else 2000)
            return x

        u = jax.lax.custom_linear_solve(mv_c, b, inner, symmetric=True)
        return u, params

    def train_step(self, thickness, force):
        """value_and_grad of compliance := F·u w.r.t. thickness."""

        def compliance(th):
            u, params = self._solve(th, force)
            F = -self.asm.residual(jnp.zeros(self.n), params) * self.free_mask
            return jnp.vdot(F, u)

        return jax.value_and_grad(compliance)(thickness)


class ShardedPlateStep:
    """Multi-chip TRANSIENT training step: implicit-midpoint RM plate time
    loop with cell-sharded operators, differentiated end-to-end.

    The stiffness and consistent-mass element matrices are assembled once
    per step call on their owning shards (ShardedAssembler.make_matvec) and
    reused by every time step; the lax.scan body's matvecs and the inner CG
    of each custom_linear_solve run SPMD (gather -> local cell matvec ->
    scatter-add -> psum over ICI), with dof vectors replicated. This extends
    the static multi-chip path (ShardedShellStep) to the reference's
    dynamic workload (SURVEY.md §3.3): the sharding analogue of
    data-parallelism over cells, scanned over the time axis.
    """

    def __init__(self, nx=8, ny=4, dt=0.01, nsteps=4, jmesh=None,
                 bc_func=None):
        from ..mesh import createRectangleMesh
        from ..models.rm_shell.pde import RMShellPDE

        self.jmesh = jmesh or make_device_mesh()
        self.dt, self.nsteps = float(dt), int(nsteps)
        mesh = createRectangleMesh(nx, ny, (0, 0), (10.0, 2.0), "quad",
                                   gdim=3)
        self.mesh = mesh
        pde = self.pde = RMShellPDE(mesh, element_wise_material=True,
                                    inplane_deg=2, shear_deg=2, stress_deg=2)
        from ..spaces import locate_dofs_geometric

        bc_func = bc_func or (lambda x: x[:, 0] < 1e-12)
        d1 = locate_dofs_geometric(pde.V_disp, bc_func)
        d2 = locate_dofs_geometric(pde.V_rot, bc_func)
        dofs = np.concatenate([d1, d2 + pde.V_disp.n_dofs])
        self.free_mask, _ = combine_bcs(pde.W.n_dofs,
                                        [DirichletBC(dofs, 0.0)])
        self.kform = pde.make_residual_form()
        self.mform = pde.inertia_form()  # params: thickness, density
        self.k_asm = ShardedAssembler(self.kform, self.jmesh)
        self.m_asm = ShardedAssembler(self.mform, self.jmesh)
        self.n = pde.W.n_dofs
        nel = mesh.n_cells
        self.example_thickness = jnp.full(pde.VT.n_dofs, 0.05)
        f = np.zeros((mesh.n_nodes, 3))
        f[:, 2] = 500.0
        # constant-in-time force history (time_levels, 3*nn)
        self.example_f_history = jnp.tile(f.reshape(1, -1),
                                          (self.nsteps + 1, 1))
        self._rho = jnp.full(nel, 10.0)

    def _k_params(self, thickness, f_vec):
        return {
            "thickness": thickness,
            "E": jnp.full_like(thickness, 4.32e8),
            "nu": jnp.zeros_like(thickness),
            "uhat": jnp.zeros(self.pde.VU.n_dofs),
            "F_solid": f_vec,
        }

    def total_strain_energy(self, thickness, f_history):
        """Differentiable total strain energy of the implicit-midpoint
        trajectory (sum over steps of 0.5 w^T K w)."""
        dt = self.dt
        n = self.n
        free = self.free_mask
        zero_f = jnp.zeros_like(f_history[0])
        pk = self._k_params(thickness, zero_f)
        K_mv = self.k_asm.make_matvec(jnp.zeros(n), pk)
        M_mv = self.m_asm.make_matvec(
            jnp.zeros(n), {"thickness": thickness, "density": self._rho})

        def A_mv(x):
            return (2.0 / dt**2) * M_mv(x) + 0.5 * K_mv(x)

        A_c = constrain_matvec(A_mv, free)

        def inner(op, rhs):
            x, _ = cg_solve(op, rhs, tol=1e-11, maxiter=4000)
            return x

        # per-level consistent load vectors: the residual at u=0 with the
        # force field installed is exactly -F (load-work energy gradient)
        F_all = jnp.stack([
            -self.k_asm.residual(jnp.zeros(n),
                                 self._k_params(thickness, f_history[i]))
            for i in range(1, self.nsteps + 1)
        ])

        def step(carry, F_i):
            w_old, wdot_old = carry
            b = (F_i + (2.0 / dt**2) * M_mv(w_old)
                 + (2.0 / dt) * M_mv(wdot_old) - 0.5 * K_mv(w_old))
            b = free * b
            w = jax.lax.custom_linear_solve(A_c, b, inner, symmetric=True)
            wdot = (2.0 / dt) * (w - w_old) - wdot_old
            e_t = 0.5 * jnp.vdot(w, K_mv(w))
            return (w, wdot), e_t

        (_, _), e_hist = jax.lax.scan(
            step, (jnp.zeros(n), jnp.zeros(n)), F_all)
        return jnp.sum(e_hist)

    def train_step(self, thickness, f_history):
        """value_and_grad of the gust-style objective w.r.t. thickness."""
        return jax.value_and_grad(self.total_strain_energy)(
            thickness, f_history)
