"""Nullspace-based aggregation AMG for unstructured meshes + penalty BCs.

STATUS (experimental, not the default): the MUMPS-parity production path for
unstructured penalty shells is the RCM band Cholesky (solvers/band.py). This
module's components are verified (P/R adjoint pair, exact Galerkin coarse
product, SPD preconditioner — tests/test_amg.py) but its aggregate
rigid-body-mode coarse space is provably weak for THIN shells: the low
modes are inextensional bending + local mechanisms whose best A-norm
approximation from piecewise-RBM spaces is ~0 (measured residual-energy
fractions 0.997-1.0 at t/h ~ 1e-2), because any interpolation error excites
membrane energy ~(h/t)^2 larger than bending energy. Robustness requires a
spectral (GenEO-type) coarse space — per-subdomain generalized eigenproblems
A_Neu p = lambda (X A X) p discover exactly those modes (sandbox: 1500+ ->
95 PCG iterations with 32 modes/subdomain, 2-layer overlap, hybrid cycle);
that upgrade can reuse this module's aggregation/setup machinery. Until
then this solver is useful as a light iterative option for membrane- or
moderate-thickness problems.

Reference context: the reference solves every such system with LU/MUMPS
(utils_dolfinx.py:495-531, rm_shell_model.py:35); the structured-mesh
geometric MG (solvers/multigrid.py) cannot apply on unstructured meshes —
no nested hierarchy — and the beta=1e15/h facet terms
(linear_shell_model.py:323-333) poison plain smoothing preconditioners.

Design (TPU-first):
- Aggregation is HOST setup, geometry/topology only, computed once per model
  (like the reference's symbolic/FFCx phase): greedy Vanek-style aggregation
  of mesh nodes on the cell-sharing graph, optionally merged to bound the
  coarse size. Every scalar dof (any subspace: CG2 edge/cell dofs included)
  joins the aggregate of its nearest mesh node.
- The tentative prolongator is built from the 6 rigid-body modes of the
  shell (3 translations; 3 linearized rotations acting as r x (x-c) on
  displacement dofs and as the constant r on rotation dofs), QR-orthonormal
  per aggregate — the standard smoothed-aggregation nullspace recipe, kept
  UNsmoothed so P stays a gather + 6-weight contraction (pad-free lane-major:
  6 gathers / 6 segment_sums of (n_dofs,) arrays, no (n,6)->(n,128) lane
  padding).
- Per-design setup (thickness changes every optimizer iteration) is pure
  JAX: the coarse operator A_c = P^T A P is assembled on device from the
  per-cell element matrices by a chunked pair-scatter (segment_sum into the
  dense (6 NA)^2 coarse matrix), then inverted once (Jacobi-scaled, f32-safe
  like the geometric-MG coarse level). Fine-level smoothing is Chebyshev
  over the weighted additive-Schwarz element-block split (the strong shell
  smoother of solvers/multigrid.py).
- Penalty BCs are handled by an F/P SPLIT, not by smoothing through them:
  dofs touched by the penalty facet operator (algebraically detected from
  its assembled diagonal) are masked out of the AMG hierarchy and get an
  exact diagonal solve instead. After diagonal scaling the penalty block is
  a well-conditioned facet mass matrix, and its coupling to the elastic
  block is O(sqrt(elastic/beta)) ~ 1e-3 — CG sees the spectrum of the
  strong-BC AMG plus a tight penalty cluster.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..assembly.assemble import gather_1d, gather_dofs, make_matvec
from .multigrid import (
    apply_schwarz,
    block_jacobi_arrays,
    apply_block_jacobi,
    chebyshev_smooth,
    estimate_lmax,
    schwarz_arrays,
)


# --------------------------------------------------------------------------
# host-side aggregation
# --------------------------------------------------------------------------


def node_adjacency(conn, n_nodes):
    """Node -> set(neighbor nodes) via shared cells (host, setup-only)."""
    adj = [set() for _ in range(n_nodes)]
    conn = np.asarray(conn)
    for cell in conn:
        for a in cell:
            adj[a].update(int(x) for x in cell if x != a)
    return adj


def aggregate_nodes(conn, n_nodes, max_aggregates=None, rounds=0):
    """Greedy Vanek aggregation of mesh nodes; returns (n_nodes,) agg ids.

    Phase 1: nodes whose neighborhood is fully unaggregated seed a new
    aggregate from that neighborhood. Phase 2: leftovers join the most
    popular neighboring aggregate. `rounds` extra pairwise-merge sweeps on
    the aggregate graph coarsen further (each halves the count, roughly);
    with `max_aggregates` set, merging continues until under the cap.
    """
    adj = node_adjacency(conn, n_nodes)
    agg = -np.ones(n_nodes, dtype=np.int64)
    na = 0
    for v in range(n_nodes):
        if agg[v] != -1:
            continue
        if all(agg[u] == -1 for u in adj[v]):
            agg[v] = na
            for u in adj[v]:
                agg[u] = na
            na += 1
    for v in range(n_nodes):
        if agg[v] != -1:
            continue
        counts = {}
        for u in adj[v]:
            if agg[u] != -1:
                counts[agg[u]] = counts.get(agg[u], 0) + 1
        if counts:
            agg[v] = max(counts, key=counts.get)
        else:  # isolated node
            agg[v] = na
            na += 1

    def merge_pass(agg, na):
        # aggregate adjacency
        aadj = [set() for _ in range(na)]
        for v in range(n_nodes):
            for u in adj[v]:
                if agg[u] != agg[v]:
                    aadj[agg[v]].add(int(agg[u]))
        matched = -np.ones(na, dtype=np.int64)
        new_id = 0
        for a in range(na):
            if matched[a] != -1:
                continue
            partner = -1
            for b in aadj[a]:
                if matched[b] == -1:
                    partner = b
                    break
            matched[a] = new_id
            if partner != -1:
                matched[partner] = new_id
            new_id += 1
        return matched[agg], new_id

    for _ in range(rounds):
        agg, na = merge_pass(agg, na)
    if max_aggregates is not None:
        while na > max_aggregates:
            agg, na_new = merge_pass(agg, na)
            if na_new == na:
                break
            na = na_new
    return agg, na


def shell_nullspace(W, kinds, dof_coords_list, center=None):
    """Rigid-body modes B (n_dofs, 6) for a mixed shell space.

    kinds: per-subspace 'disp' (modes: translations + r x (x-c)) or 'rot'
    (modes: 0 + constant r) or 'scalar' (single constant mode in column 0).
    dof_coords_list: per-subspace (n_scalar, gdim>=3-padded) coordinates."""
    B = np.zeros((W.n_dofs, 6))
    if center is None:
        center = np.mean(np.concatenate(dof_coords_list, axis=0), axis=0)
    for i, sub in enumerate(W.subspaces):
        o = int(W.offsets[i])
        vs = sub.value_size
        x = np.asarray(dof_coords_list[i], dtype=np.float64)
        if x.shape[1] < 3:
            x = np.concatenate(
                [x, np.zeros((len(x), 3 - x.shape[1]))], axis=1)
        ns = sub.n_scalar_dofs
        if kinds[i] == "disp":
            assert vs == 3
            d = x - center[None, :3]
            for k in range(3):  # translations
                B[o + k: o + 3 * ns: 3, k] = 1.0
            # rotations r_k x d  (r=e_k): rows are the 3 components per node
            rx = np.zeros((ns, 3, 3))
            rx[:, 0, 1] = -d[:, 2]
            rx[:, 0, 2] = d[:, 1]
            rx[:, 1, 0] = d[:, 2]
            rx[:, 1, 2] = -d[:, 0]
            rx[:, 2, 0] = -d[:, 1]
            rx[:, 2, 1] = d[:, 0]
            B[o: o + 3 * ns, 3:6] = rx.reshape(3 * ns, 3)
        elif kinds[i] == "rot":
            assert vs == 3
            for k in range(3):
                B[o + k: o + 3 * ns: 3, 3 + k] = 1.0
        else:  # scalar
            B[o: o + sub.n_dofs, 0] = 1.0
    return B


# --------------------------------------------------------------------------
# the preconditioner
# --------------------------------------------------------------------------


class AggregationAMG:
    """Two-level nullspace aggregation AMG preconditioner (CG-symmetric).

    Static structure (aggregation, tentative-prolongator weights) is host
    setup; per-design state (Schwarz blocks, lambda_max, dense coarse
    inverse) is a pytree from `setup` — jit-safe like GeometricMG.
    """

    def __init__(self, space, kinds=None, free_mask=None, agg_rounds=1,
                 max_coarse_dofs=4800, degree=3, lmin_ratio=0.3,
                 power_iters=20, smoother="schwarz", chunk_cells=512):
        W = space
        mesh = W.subspaces[0].mesh if hasattr(W, "subspaces") else W.mesh
        if not hasattr(W, "subspaces"):
            raise TypeError("AggregationAMG expects a MixedSpace")
        if kinds is None:
            kinds = ["disp"] + ["rot"] * (len(W.subspaces) - 1)
        self.space = W
        self.degree = degree
        self.lmin_ratio = lmin_ratio
        self.power_iters = power_iters
        self.smoother = smoother
        self.chunk_cells = chunk_cells

        max_aggs = max(1, max_coarse_dofs // 6)
        agg_nodes, na = aggregate_nodes(
            mesh.conn, mesh.n_nodes, max_aggregates=max_aggs,
            rounds=agg_rounds)
        self.n_agg = int(na)
        self.nc_dofs = 6 * self.n_agg

        # scalar dof -> aggregate (nearest mesh node; exact for vertex dofs,
        # containing-edge endpoint for CG2 edge/cell dofs)
        from scipy.spatial import cKDTree

        tree = cKDTree(np.asarray(mesh.coords))
        dof_coords = []
        agg_per_dof = np.empty(W.n_dofs, dtype=np.int64)
        for i, sub in enumerate(W.subspaces):
            xc = np.asarray(sub.dof_coords)
            dof_coords.append(xc)
            _, nearest = tree.query(xc)
            a = agg_nodes[nearest]
            o = int(W.offsets[i])
            vs = sub.value_size
            agg_per_dof[o: o + sub.n_dofs] = np.repeat(a, vs)
        B = shell_nullspace(W, kinds, dof_coords)

        free_np = (np.ones(W.n_dofs)
                   if free_mask is None else np.asarray(free_mask))
        B = B * free_np[:, None]  # constrained dofs carry no coarse modes

        # per-aggregate QR of the nullspace rows -> tentative prolongator
        # weights w (n_dofs, 6); rank-deficient columns zeroed (guarded by an
        # identity coarse diagonal later)
        order = np.argsort(agg_per_dof, kind="stable")
        bounds = np.searchsorted(agg_per_dof[order],
                                 np.arange(self.n_agg + 1))
        w = np.zeros((W.n_dofs, 6))
        for a in range(self.n_agg):
            rows = order[bounds[a]: bounds[a + 1]]
            if len(rows) == 0:
                continue
            Ba = B[rows]  # (m, 6)
            q, r = np.linalg.qr(Ba)
            keep = np.abs(np.diagonal(r)) > 1e-10 * max(
                1.0, np.abs(r).max())
            w[rows] = q * keep[None, :]
        self.free_np = free_np
        # device tables, lane-major (6 gathers / segment_sums of (n,) data)
        self.agg_d = jnp.asarray(agg_per_dof.astype(np.int32))
        self.w_cols = [jnp.asarray(w[:, k]) for k in range(6)]
        # coarse scatter index per cell-local dof pair, built per chunk at
        # setup (needs only dofmap + agg table)
        self.dofmap_d = W.dofmap_d  # (ncell, nd)
        self.free_d = jnp.asarray(free_np)

    # --------------------------------------------------------------- P ops
    def prolong(self, xc):
        """xc (6*NA,) -> fine (n_dofs,)."""
        Xc = xc.reshape(6, self.n_agg)
        out = 0.0
        for k in range(6):
            out = out + self.w_cols[k].astype(xc.dtype) * gather_1d(
                Xc[k], self.agg_d)
        return out

    def restrict(self, r):
        parts = [
            jax.ops.segment_sum(
                self.w_cols[k].astype(r.dtype) * r, self.agg_d,
                num_segments=self.n_agg)
            for k in range(6)
        ]
        return jnp.concatenate(parts)

    # -------------------------------------------------------------- setup
    def _coarse_dense(self, Ae, free):
        """A_c = P^T (f A f) P as a dense (6NA, 6NA) array via chunked
        pair-scatter over cells. Ae cell-major (nc, nd, nd)."""
        W = self.space
        NA = self.n_agg
        nc, nd, _ = Ae.shape
        dm = self.dofmap_d
        G = gather_dofs(self.agg_d, dm)  # (nc, nd) int32
        fm = gather_dofs(free, dm)
        Wc = jnp.stack(
            [gather_dofs(c.astype(Ae.dtype), dm) for c in self.w_cols],
            axis=-1)  # (nc, nd, 6)
        Aef = Ae * fm[:, :, None] * fm[:, None, :]

        c = min(self.chunk_cells, nc)
        while nc % c != 0:
            c -= 1
        k = nc // c

        def per_chunk(carry, args):
            Ae_b, Wc_b, G_b = args
            # (c, nd, nd, 6, 6) pair contributions
            contrib = (Ae_b[:, :, :, None, None]
                       * Wc_b[:, :, None, :, None]
                       * Wc_b[:, None, :, None, :])
            seg = (G_b[:, :, None] * NA + G_b[:, None, :]).reshape(-1)
            flat = contrib.reshape(-1, 36)
            acc = jax.ops.segment_sum(flat, seg, num_segments=NA * NA)
            return carry + acc, 0

        init = jnp.zeros((NA * NA, 36), dtype=Ae.dtype)
        acc, _ = jax.lax.scan(
            per_chunk, init,
            (Aef.reshape(k, c, nd, nd), Wc.reshape(k, c, nd, 6),
             G.reshape(k, c, nd)))
        Ac = acc.reshape(NA, NA, 6, 6)
        # coarse dof order is mode-major (k*NA + I), matching
        # prolong/restrict: entry (k*NA+I, l*NA+J) = Ac[I, J, k, l]
        Ac = jnp.transpose(Ac, (2, 0, 3, 1)).reshape(6 * NA, 6 * NA)
        # guard empty/deficient coarse dofs
        d = jnp.diagonal(Ac)
        Ac = Ac + jnp.diag(jnp.where(d == 0.0, 1.0, 0.0))
        return Ac

    def setup(self, Ae, free_mask=None, dtype=None):
        """Per-design state from cell-major element matrices (nc, nd, nd).

        free_mask overrides the constructor mask (e.g. with penalty dofs
        additionally masked); dtype casts the preconditioner state (f32 on
        TPU)."""
        if dtype is not None:
            Ae = Ae.astype(dtype)
        free = (self.free_d if free_mask is None else free_mask).astype(
            Ae.dtype)
        W = self.space
        if self.smoother == "schwarz":
            sm = schwarz_arrays(Ae, W, free)
        else:
            sm = block_jacobi_arrays(Ae, W, free)
        mv = _masked_matvec(Ae, W, free)
        lmax = estimate_lmax(
            mv, lambda v: self._smooth_apply(sm, v), int(W.n_dofs),
            Ae.dtype, iters=self.power_iters)
        Ac = self._coarse_dense(Ae, free)
        s = 1.0 / jnp.sqrt(jnp.abs(jnp.diagonal(Ac)))
        As = Ac * s[:, None] * s[None, :]
        if As.dtype == jnp.float64 and jax.default_backend() == "tpu":
            coarse_inv = jnp.linalg.inv(As.astype(jnp.float32))
        else:
            coarse_inv = jnp.linalg.inv(As)
        return {"Ae": Ae, "sm": sm, "lmax": lmax, "free": free,
                "coarse_inv": coarse_inv, "coarse_scale": s}

    def _smooth_apply(self, sm, v):
        if self.smoother == "schwarz":
            return apply_schwarz(self.space, sm[0], sm[1], v)
        return apply_block_jacobi(self.space, sm, v)

    # -------------------------------------------------------------- apply
    def apply(self, state, b):
        """One 2-level cycle from zero guess — the M^{-1} of PCG."""
        W = self.space
        free = state["free"].astype(b.dtype)
        b = free * b
        Ae = state["Ae"].astype(b.dtype)
        mv = _masked_matvec(Ae, W, free)
        sm = jax.tree.map(lambda a: a.astype(b.dtype), state["sm"])
        lmax = state["lmax"].astype(b.dtype)
        Minv = lambda v: self._smooth_apply(sm, v)  # noqa: E731
        x = jnp.zeros_like(b)
        x = chebyshev_smooth(mv, Minv, lmax, b, x, degree=self.degree,
                             lmin_ratio=self.lmin_ratio)
        r_c = self.restrict(b - mv(x))
        s = state["coarse_scale"].astype(b.dtype)
        e_c = s * (state["coarse_inv"].astype(b.dtype) @ (s * r_c))
        x = x + free * self.prolong(e_c)
        x = chebyshev_smooth(mv, Minv, lmax, b, x, degree=self.degree,
                             lmin_ratio=self.lmin_ratio)
        return x


def _masked_matvec(Ae, W, free):
    raw = make_matvec(Ae, W)

    def mv(x):
        return free * raw(free * x)

    return mv


# --------------------------------------------------------------------------
# penalty split
# --------------------------------------------------------------------------


def penalty_split(facet_ops, n_dofs, rel_tol=1e-10):
    """Detect penalty-dominated dofs algebraically from the facet operator's
    assembled diagonal. Returns (pen_mask (n,), pen_diag (n,)) numpy-free
    device arrays; pen_mask is 1.0 on dofs the penalty touches."""
    from ..assembly.assemble import scatter_add

    pen_diag = jnp.zeros(n_dofs)
    for Ae_f, spec in facet_ops:
        dg = jnp.diagonal(Ae_f, axis1=1, axis2=2)
        if hasattr(spec, "scatter_add"):
            pen_diag = pen_diag + spec.scatter_add(dg)
        else:
            pen_diag = pen_diag + scatter_add(spec, dg, n_dofs)
    mx = jnp.max(pen_diag)
    pen_mask = (pen_diag > rel_tol * mx).astype(pen_diag.dtype)
    return pen_mask, pen_diag


class PenaltySplitAMG:
    """M^{-1} = AMG on the penalty-masked elastic block (+) exact diagonal
    solve on the penalty block — symmetric PSD, valid for CG.

    Penalty rows after diagonal scaling form a well-conditioned facet mass
    system; coupling to the elastic block is O(sqrt(elastic/beta)). The AMG
    treats penalized dofs exactly like strong-BC dofs.
    """

    def __init__(self, amg: AggregationAMG, state, pen_mask, diag_full,
                 free_mask=None):
        self.amg = amg
        self.state = state
        self.pen_mask = pen_mask
        safe = jnp.where(diag_full != 0.0, diag_full, 1.0)
        self.pen_inv = pen_mask / safe
        n = amg.space.n_dofs
        self.dead = (jnp.zeros(n) if free_mask is None
                     else 1.0 - jnp.asarray(free_mask))

    def __call__(self, v):
        pm = self.pen_mask.astype(v.dtype)
        y = self.amg.apply(self.state, (1.0 - pm) * v)
        return ((1.0 - pm) * y + self.pen_inv.astype(v.dtype) * v
                + self.dead.astype(v.dtype) * v)


def build_penalty_split_precond(amg, cell_Ae, facet_ops, free_mask,
                                dtype=None):
    """One-call construction: mask = free AND not-penalized; AMG state on the
    elastic block; diagonal on the penalty block (elastic+penalty diagonal,
    so penalty rows see their full row scale)."""
    n = amg.space.n_dofs
    if facet_ops:
        pen_mask, pen_diag = penalty_split(facet_ops, n)
    else:
        pen_mask = jnp.zeros(n, dtype=cell_Ae.dtype)
        pen_diag = jnp.zeros(n, dtype=cell_Ae.dtype)
    free = jnp.asarray(free_mask, dtype=cell_Ae.dtype)
    amg_mask = free * (1.0 - pen_mask)
    state = amg.setup(cell_Ae, free_mask=amg_mask, dtype=dtype)
    W = amg.space
    diag = W.scatter_add(jnp.diagonal(cell_Ae, axis1=1, axis2=2))
    diag_full = (diag + pen_diag) * free + (1.0 - free)
    return PenaltySplitAMG(amg, state, pen_mask * free, diag_full,
                           free_mask=free)


class AMGPrecondFactory:
    """Split-protocol adapter (ImplicitPDE staged path — same contract as
    solvers.band.BandPrecond): two-level nullspace-aggregation AMG on the
    elastic block + exact diagonal on the penalty block. Selected by
    RMShellModel when the RCM band Cholesky is memory-infeasible
    (models/rm_shell/model.py) — the fallback used to be plain Jacobi-CG,
    which needs ~3100 iterations/solve on shell operators (round-4
    verdict: a >100k-dof unstructured wing had no workable solver).

    setup_state returns a pure PYTREE (AMG state + penalty-split arrays)
    so the forward solve's preconditioner state flows through the
    custom_vjp residuals to the adjoint solve, like every other
    preconditioner on this path.
    """

    def __init__(self, space, form, facet_forms=(), free_mask=None,
                 dtype=None, **amg_kw):
        self.amg = AggregationAMG(form.space, free_mask=free_mask, **amg_kw)
        n = form.space.n_dofs
        self.free_mask = (np.ones(n) if free_mask is None
                          else np.asarray(free_mask))
        self.dtype = dtype
        self._specs = [form.space] + [
            g["dofmap_d"] for ff in facet_forms for g in ff.groups]

    def prepare(self, params):
        return ()

    def setup_state(self, u, params, ops_Ae, aux):
        cell_Ae = ops_Ae[0]
        n = self.amg.space.n_dofs
        facet_ops = list(zip(ops_Ae[1:], self._specs[1:]))
        if facet_ops:
            pen_mask, pen_diag = penalty_split(facet_ops, n)
        else:
            pen_mask = jnp.zeros(n, dtype=cell_Ae.dtype)
            pen_diag = jnp.zeros(n, dtype=cell_Ae.dtype)
        free = jnp.asarray(self.free_mask).astype(cell_Ae.dtype)
        amg_mask = free * (1.0 - pen_mask)
        st = self.amg.setup(cell_Ae, free_mask=amg_mask, dtype=self.dtype)
        W = self.amg.space
        diag = W.scatter_add(jnp.diagonal(cell_Ae, axis1=1, axis2=2))
        diag_full = (diag + pen_diag) * free + (1.0 - free)
        safe = jnp.where(diag_full != 0.0, diag_full, 1.0)
        return {
            "amg": st,
            "pen_mask": pen_mask * free,
            "pen_inv": (pen_mask * free) / safe,
            "dead": 1.0 - free,
        }

    def apply_state(self, state, v):
        pm = state["pen_mask"].astype(v.dtype)
        y = self.amg.apply(state["amg"], (1.0 - pm) * v)
        return ((1.0 - pm) * y + state["pen_inv"].astype(v.dtype) * v
                + state["dead"].astype(v.dtype) * v)
