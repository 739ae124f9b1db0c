"""Product-path multi-chip: SPMD cell sharding for the LIBRARY models.

The round-1/2 demo classes (parallel/sharding.py) proved the collective
pattern with shard_map over their own toy meshes; this module distributes
the PRODUCT operators instead — `RMShellModel`, `PlateSim`, any
`ImplicitPDE` — over a `jax.sharding.Mesh`, the way the reference's MPI
substrate distributes any dolfinx model (fea/utils_dolfinx.py:180-186 ghost
updates; fea_dolfinx.py:50-51 index maps).

Mechanism (GSPMD, not shard_map): every cell-indexed operator array — the
affine design bases, the assembled element-matrix blocks, each MG level's
state — is committed/constrained to a NamedSharding that splits the CELL
axis across devices, while dof vectors stay replicated. XLA's SPMD
partitioner then distributes every consumer automatically: the affine
AXPY re-assembly, the gather -> element-matvec -> scatter-add pipeline
(partial scatters + one AllReduce over ICI, exactly the reference's
ghost-accumulate), the V-cycle smoothers, and the jax.vjp design-gradient
kernels — with zero forks in the library code and no cell-count
divisibility requirement (GSPMD pads internally). This composes with both
execution paths: the fused custom_vjp programs AND the hostloop's staged
programs (adjoint/hostloop.py) receive sharded operator arguments and
compile to SPMD modules.

Usage:
    jmesh = make_device_mesh()                     # all visible devices
    model = RMShellModel(mesh, ...)
    shard_model(model, jmesh)                      # in-place
    out = model.evaluate(force, thickness, ...)    # SPMD

Validated on the 8-device virtual CPU mesh against single-device values to
1e-9 / gradients to 1e-6 (tests/test_product_sharding.py) and compiled in
the driver dryrun (__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .sharding import make_device_mesh  # noqa: F401  (re-export)


class CellShardSpec:
    """Sharding policy for one device-mesh axis over the cell dimension.

    XLA/jax require the sharded dimension to be DIVISIBLE by the shard
    count, so each array is split over the largest device count (<= the
    mesh size) that divides its own cell extent — full width for
    structured meshes (power-of-two cell counts), a divisor sub-mesh for
    unstructured ones (e.g. a 2388-quad wing shards 4-ways on 8 devices).
    Production meshes should size cell counts as multiples of the device
    count for full utilization; GSPMD reshards seamlessly when levels
    land on different sub-meshes."""

    def __init__(self, jmesh, axis="cells"):
        self.jmesh = jmesh
        self.axis = axis
        self.n_devices = int(jmesh.shape[axis])
        self._submeshes = {self.n_devices: jmesh}
        self._warned = set()

    def _mesh_for(self, size):
        from jax.sharding import Mesh as JaxMesh

        k = self.n_devices
        while k > 1 and size % k != 0:
            k -= 1
        if k == 1:
            return None
        m = self._submeshes.get(k)
        if m is None:
            devs = self.jmesh.devices.reshape(-1)[:k]
            m = self._submeshes[k] = JaxMesh(np.array(devs), (self.axis,))
        if k < self.n_devices and size not in self._warned:
            self._warned.add(size)
            from ..utils.logging import log

            log(f"shard: cell extent {size} not divisible by "
                f"{self.n_devices} devices — sharding {k}-ways "
                "(pad the mesh's cell count to a device-count multiple "
                "for full utilization)")
        return m

    def spec_for(self, ndim, cell_dim, size):
        m = self._mesh_for(size)
        if m is None:
            return None
        dims = [None] * ndim
        dims[cell_dim] = self.axis
        return NamedSharding(m, P(*dims))

    def constrain(self, a, cell_dim):
        """with_sharding_constraint splitting `cell_dim` (trace-safe)."""
        s = self.spec_for(a.ndim, cell_dim, int(a.shape[cell_dim]))
        if s is None:
            return a
        return jax.lax.with_sharding_constraint(a, s)

    def commit(self, a, cell_dim):
        """device_put splitting `cell_dim` (concrete arrays: aux bases)."""
        s = self.spec_for(np.ndim(a), cell_dim, int(np.shape(a)[cell_dim]))
        if s is None:
            return jnp.asarray(a)
        return jax.device_put(a, s)

    def replicate(self, a):
        return jax.device_put(a, NamedSharding(self.jmesh, P()))


def _op0_cell_dim(pde):
    """Cell axis of ops_Ae[0]: 'lane' layout is (nd, nd, nc), else
    (nc, nd, nd)."""
    return 2 if pde.solver_opts.get("op0_layout") == "lane" else 0


def _shard_implicit_pde(pde, spec: CellShardSpec):
    """Install the shard spec on one ImplicitPDE (adjoint/implicit.py).

    The PDE's `_assemble_ops` constrains its fine operator block, the
    preconditioner's `shard_state` (when it has one) constrains its level
    state, and `_prepare_aux` commits the host-built affine/MG bases —
    after that every jitted program (fused or hostloop-staged) sees sharded
    operator inputs and partitions SPMD."""
    pde.shard_spec = spec
    # re-commit any aux already prepared (solve() caches it)
    if getattr(pde, "_aux_now", None) is not None:
        pde._aux_now = shard_aux(pde, pde._aux_now)


def shard_aux(pde, aux):
    """Commit a prepared aux pytree = (emf_basis, pc_aux, facet_ops)
    with cell shardings. emf_basis: (K, nc, nd, nd) cells /
    (K, nd, nd, nc) lane. pc_aux: tuple of per-level bases in the
    preconditioner's layout. facet_ops (O(boundary), tiny) replicate."""
    spec = getattr(pde, "shard_spec", None)
    if spec is None or aux is None:
        return aux
    emf_basis, pc_aux = aux[0], aux[1]
    rest = aux[2:]
    if emf_basis is not None:
        cd = 1 + _op0_cell_dim(pde) if _op0_cell_dim(pde) == 0 else 3
        # tree_map: the basis may be a float-float DF pair of arrays
        # (assembly/affine.py storage='df') — each leaf shares the layout
        emf_basis = jax.tree.map(lambda a: spec.commit(a, cd), emf_basis)
    if pc_aux:
        pc = getattr(pde, "_pc", None)
        lane = bool(getattr(getattr(pc, "mg", None), "lane_major", False))
        pc_aux = tuple(
            spec.commit(b, 3 if lane else 1) for b in pc_aux
        )
    return (emf_basis, pc_aux) + tuple(rest)


def shard_ops(pde, ops_Ae):
    """Constrain assembled element-operator blocks: the fine block splits
    over cells; facet blocks (O(boundary), tiny) stay replicated."""
    spec = getattr(pde, "shard_spec", None)
    if spec is None:
        return ops_Ae
    cd = _op0_cell_dim(pde)
    return [spec.constrain(ops_Ae[0], cd)] + list(ops_Ae[1:])


def shard_mg_state(mg, state, spec: CellShardSpec):
    """Constrain each MG level's element matrices over the cell axis.
    Layout per GeometricMG.lane_major: (nd, nd, nc_k) or (nc_k, nd, nd).
    Levels small enough that splitting is pure overhead still shard —
    GSPMD's cost there is negligible at dryrun scale, and on real meshes
    the coarse work is noise by construction."""
    lane = bool(getattr(mg, "lane_major", False))
    cd = 2 if lane else 0
    out = dict(state)
    out["Ae"] = [spec.constrain(Ae, cd) for Ae in state["Ae"]]
    return out


def shard_model(target, jmesh=None, axis="cells"):
    """Distribute a library model over a device mesh, in place.

    target: RMShellModel, FEA, ImplicitPDE, or PlateSim. Returns target.
    """
    jmesh = jmesh or make_device_mesh()
    spec = CellShardSpec(jmesh, axis)

    from ..adjoint.implicit import ImplicitPDE
    from ..fea.fea import FEA

    if isinstance(target, ImplicitPDE):
        _shard_implicit_pde(target, spec)
        return target
    if isinstance(target, FEA):
        for st in target.states.values():
            _shard_implicit_pde(st.pde, spec)
        return target
    if hasattr(target, "fea") and isinstance(target.fea, FEA):
        # RMShellModel
        shard_model(target.fea, jmesh, axis)
        return target
    if hasattr(target, "simulate") and hasattr(target, "_element_mats"):
        # PlateSim: constrain the element operators its solver context
        # builds; everything downstream (scan body matvecs, inner CG,
        # V-cycle) partitions by propagation
        target.shard_spec = spec
        return target
    raise TypeError(f"don't know how to shard {type(target).__name__}")
