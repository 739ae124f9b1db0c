"""Blocked band Cholesky: the TPU-native MUMPS replacement for unstructured
shell meshes.

The reference factorizes every shell system with LU/MUMPS regardless of mesh
or BC type (reference: femo_alpha/fea/utils_dolfinx.py:495-531,
shell_analysis_fenicsx defaults rm_shell_model.py:35 PENALTY_BC=True). The
repo's geometric multigrid covers structured strong-BC meshes; this module
covers the reference's DEFAULT aircraft configuration — unstructured gmsh
wings with beta=1e15/h penalty facet terms — where smooth-coarse-space
preconditioners provably stall (thin-shell near-kernels: inextensional
bending + local mechanisms are invisible to piecewise-RBM or interpolatory
coarse spaces; measured residual-energy fractions ~1.0).

Design (TPU-first):
- Aircraft shells are 2D manifold meshes: after reverse Cuthill-McKee
  (native/meshops.cpp rcm_order) the stiffness matrix has bandwidth
  b = O(sqrt(N)); band storage (N, b) fits HBM where dense (N, N) cannot.
- The factorization is a blocked band Cholesky written as one `lax.scan`
  over block-columns with a static (K, K) trailing window carry
  (K = (m+1)*w, m = ceil(b/w)): chol(w x w) + triangular solve (mw x w) +
  rank-w SYRK update per step — all dense MXU work, N*b^2 flops total.
  No dynamic shapes, no gather/scatter in the hot loop.
- Mixed precision (GMRES-IR recipe, Carson & Higham): symmetrically
  equilibrate to unit diagonal (which absorbs the 1e15 penalty scale),
  factor in f32 on TPU, and use the factorization as the preconditioner of
  the existing f64 CG — kappa(M^-1 A) ~ 1 + kappa*u32, so the outer solve
  converges in a handful of iterations to 1e-11 even at shell condition
  numbers ~1e8. On CPU the factor runs in f64 and CG converges in 1-2
  iterations (an exact direct solve in practice).
- Breakdown guard: if the f32 factor goes non-finite (kappa*u ~ 1), a
  `lax.cond` refactors once with a relative diagonal shift — the shifted
  factor is a slightly weaker but always-valid SPD preconditioner.

Storage is block-band: R[t, r, c] = A[t*w + r, (t-m)*w + c] (lower triangle
only), assembled directly from element matrices by one flat segment_sum.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..native import rcm_order


# --------------------------------------------------------------------------
# host setup: permutation + bandwidth
# --------------------------------------------------------------------------


def nodal_dof_permutation(space):
    """RCM-ordered, node-grouped scalar-dof permutation for a (Mixed)Space.

    Every scalar dof (any subspace, any family — CG2 edge dofs included) is
    assigned to its nearest mesh node; dofs are ordered by the RCM position
    of that node, then by subspace, so displacement and rotation dofs of the
    same region interleave (keeping the band narrow across the mixed-space
    block structure, unlike the reference's monolithic dolfinx ordering).

    Returns (perm, iperm): perm[new] = old, iperm[old] = new.
    """
    from scipy.spatial import cKDTree

    mesh = space.mesh
    mesh._build_topology()
    node_perm = rcm_order(mesh.edges, mesh.n_nodes)
    pos = np.empty(mesh.n_nodes, dtype=np.int64)
    pos[node_perm] = np.arange(mesh.n_nodes)

    tree = cKDTree(np.asarray(mesh.coords))
    subspaces = getattr(space, "subspaces", [space])
    offsets = getattr(space, "offsets", [0])
    keys_pos = np.empty(space.n_dofs, dtype=np.int64)
    keys_sub = np.empty(space.n_dofs, dtype=np.int64)
    for i, sub in enumerate(subspaces):
        _, nearest = tree.query(np.asarray(sub.dof_coords))
        o = int(offsets[i])
        keys_pos[o: o + sub.n_dofs] = np.repeat(
            pos[nearest], sub.value_size)
        keys_sub[o: o + sub.n_dofs] = i
    order_within = np.arange(space.n_dofs)
    perm = np.lexsort((order_within, keys_sub, keys_pos))
    iperm = np.empty(space.n_dofs, dtype=np.int64)
    iperm[perm] = np.arange(space.n_dofs)
    return perm.astype(np.int32), iperm.astype(np.int32)


def _dofmap_of(spec):
    return np.asarray(spec.dofmap if hasattr(spec, "dofmap") else spec)


def permuted_bandwidth(iperm, dofmaps):
    """Half bandwidth of the permuted assembled matrix."""
    b = 0
    for dm in dofmaps:
        p = iperm[np.asarray(dm)]
        b = max(b, int((p.max(axis=1) - p.min(axis=1)).max()))
    return b


def pick_block(b, n):
    """Factor block width: wide enough for MXU efficiency, small enough that
    the (m+1)w window stays close to the true bandwidth."""
    w = 128 if b >= 384 else (64 if b >= 96 else 32)
    return min(w, max(32, n))


# --------------------------------------------------------------------------
# device: block-band assembly
# --------------------------------------------------------------------------


def assemble_block_band(ops_permuted, n, w, m, free=None, dtype=jnp.float32,
                        chunk_entries=8_000_000):
    """Block-band lower storage R (nb, w, K), K=(m+1)w, from element blocks.

    ops_permuted: [(Ae (nc, nd, nd), pdm (nc, nd) permuted dofmap)]. free:
    optional mask — constrained rows/cols are zeroed and given unit diagonal
    (same convention as dense_constrained / LinearSolver). Padding rows
    (>= n) get unit diagonal. Accumulates in f64 then casts (equilibration
    and penalty sums keep full precision)."""
    K = (m + 1) * w
    nb = -(-n // w)
    n_pad = nb * w
    acc = jnp.zeros(nb * w * K, dtype=jnp.float64)
    for Ae, pdm in ops_permuted:
        pdm = jnp.asarray(pdm)
        nc, nd, _ = Ae.shape
        Aev = Ae.astype(jnp.float64)
        if free is not None:
            fm = free.astype(jnp.float64)[pdm]
            Aev = Aev * fm[:, :, None] * fm[:, None, :]
        i = pdm[:, :, None].astype(jnp.int64)
        j = pdm[:, None, :].astype(jnp.int64)
        lower = i >= j
        t = i // w
        r = i - t * w
        c = j - (t - m) * w
        idx = jnp.where(lower, t * (w * K) + r * K + c, nb * w * K)
        # chunk the flat scatter to bound the index/value temporaries
        flat_v = Aev.reshape(-1)
        flat_i = idx.reshape(-1)
        total = flat_v.shape[0]
        if total > chunk_entries:
            k = -(-total // chunk_entries)
            pad = k * chunk_entries - total
            flat_v = jnp.pad(flat_v, (0, pad))
            flat_i = jnp.pad(flat_i, (0, pad),
                             constant_values=nb * w * K)

            def body(a, args):
                v, ii = args
                return a + jax.ops.segment_sum(
                    v, ii, num_segments=nb * w * K + 1)[:-1], 0

            acc, _ = jax.lax.scan(
                body, acc,
                (flat_v.reshape(k, -1), flat_i.reshape(k, -1)))
        else:
            acc = acc + jax.ops.segment_sum(
                flat_v, flat_i, num_segments=nb * w * K + 1)[:-1]
    R = acc.reshape(nb, w, K)
    # unit diagonal on constrained + padding rows
    rows = jnp.arange(n_pad)
    dead = rows >= n
    if free is not None:
        fperm = jnp.concatenate(
            [free, jnp.ones(n_pad - n, dtype=free.dtype)])
        dead = dead | (fperm == 0)
    R = R.reshape(n_pad, K).at[rows, m * w + rows % w].add(
        jnp.where(dead, 1.0, 0.0)).reshape(nb, w, K)
    return R.astype(dtype)


def equilibrate(R, w, m):
    """Symmetric Jacobi equilibration to unit diagonal: returns (Rs, s) with
    Rs = S A S, s = 1/sqrt(diag). Absorbs the beta=1e15 penalty scale before
    the f32 cast/factor."""
    nb, _, K = R.shape
    r_idx = jnp.arange(w)
    d = R[:, r_idx, m * w + r_idx]  # (nb, w)
    d = jnp.where(d > 0, d, 1.0)
    s = 1.0 / jnp.sqrt(d)  # (nb, w)
    sflat = s.reshape(-1)
    n_pad = nb * w
    # row scale: s_i ; col scale: s_j where j = (t-m)w + c
    row_s = s[:, :, None]
    col_j = ((jnp.arange(nb) - m)[:, None] * w + jnp.arange(K)[None, :])
    col_s = jnp.where(
        (col_j >= 0) & (col_j < n_pad),
        sflat[jnp.clip(col_j, 0, n_pad - 1)], 1.0)[:, None, :]
    return R * row_s * col_s, sflat


# --------------------------------------------------------------------------
# device: factorization + solves
# --------------------------------------------------------------------------


def band_cholesky(R, w, m):
    """Blocked band Cholesky of the block-band lower storage R (nb, w, K).

    Returns (Ld (nb, w, w) diagonal-block Cholesky factors,
             Lc (nb, mw, w) sub-diagonal column panels): A = L L^T with
    L[t*w:(t+1)*w, t*w:(t+1)*w] = Ld[t], L[(t+1)w:(t+1+m)w, tw:(t+1)w] =
    Lc[t]."""
    nb, _, K = R.shape
    mw = m * w

    W0 = jnp.zeros((K, K), dtype=R.dtype)
    for t in range(min(m + 1, nb)):
        blk = jnp.pad(R[t], ((0, 0), (0, K)))
        blk = jax.lax.dynamic_slice(blk, (0, (m - t) * w), (w, K))
        W0 = jax.lax.dynamic_update_slice(W0, blk, (t * w, 0))
    for t in range(nb, m + 1):  # tiny problems: pad identity blocks
        W0 = jax.lax.dynamic_update_slice(
            W0, jnp.eye(w, dtype=R.dtype), (t * w, t * w))
    # symmetrize (storage holds the lower triangle only)
    W0 = jnp.tril(W0) + jnp.tril(W0, -1).T

    # appended block rows for steps t: block row t+m+1 (identity when past
    # the end)
    ident = jnp.zeros((w, K), dtype=R.dtype).at[
        jnp.arange(w), mw + jnp.arange(w)].set(1.0)
    tix = jnp.arange(nb) + m + 1
    shifted = jnp.where(
        (tix < nb)[:, None, None], R[jnp.clip(tix, 0, nb - 1)], ident[None])

    def step(W, new_row):
        # the window's diagonal sub-blocks are valid in the LOWER triangle
        # only (band storage); jnp.linalg.cholesky averages (A+A^T)/2, so
        # symmetrize explicitly from the lower half first
        D = W[:w, :w]
        D = jnp.tril(D) + jnp.tril(D, -1).T
        Ld = jnp.linalg.cholesky(D)
        # Lc = W[w:, :w] @ Ld^-T  (solve Ld X^T = W[w:, :w]^T)
        Lc = solve_triangular(Ld, W[w:, :w].T, lower=True).T
        W2 = W[w:, w:] - Lc @ Lc.T
        Wn = jnp.zeros_like(W)
        Wn = Wn.at[:mw, :mw].set(W2)
        Wn = Wn.at[mw:, :].set(new_row)
        Wn = Wn.at[:mw, mw:].set(new_row[:, :mw].T)
        return Wn, (Ld, Lc)

    _, (Lds, Lcs) = jax.lax.scan(step, W0, shifted)
    return Lds, Lcs


def band_solve(Lds, Lcs, b):
    """Solve L L^T x = b given band_cholesky factors. b: (n_pad,)."""
    nb, w, _ = Lds.shape
    mw = Lcs.shape[1]
    bb = b.reshape(nb, w).astype(Lds.dtype)

    def fwd(corr, args):
        Ld, Lc, bt = args
        y = solve_triangular(Ld, bt - corr[:w], lower=True)
        corr = jnp.concatenate([corr[w:], jnp.zeros(w, dtype=corr.dtype)])
        corr = corr + Lc @ y
        return corr, y

    corr0 = jnp.zeros(mw, dtype=Lds.dtype)
    _, ys = jax.lax.scan(fwd, corr0, (Lds, Lcs, bb))

    def bwd(xw, args):
        Ld, Lc, yt = args
        x = solve_triangular(Ld.T, yt - Lc.T @ xw, lower=False)
        xw = jnp.concatenate([x, xw[:mw - w]])
        return xw, x

    xw0 = jnp.zeros(mw, dtype=Lds.dtype)
    _, xs = jax.lax.scan(bwd, xw0, (Lds, Lcs, ys), reverse=True)
    return xs.reshape(-1)


# --------------------------------------------------------------------------
# the solver / preconditioner object
# --------------------------------------------------------------------------


class BandCholPrecond:
    """Static structure (permutation, bandwidth, block sizes) computed once
    per space+ops pattern on host; `setup(ops, free)` assembles, equilibrates
    and factors on device (jit-safe); `apply` solves in factor precision.

    Used as LinearSolver M: with an f64 factor the outer CG converges in
    1-2 iterations (direct-solve parity); with f32 (TPU) in O(10)."""

    def __init__(self, space, dofmaps, dtype=None, shift=1e-5):
        self.space = space
        self.n = space.n_dofs
        self.perm, self.iperm = nodal_dof_permutation(space)
        self.b = permuted_bandwidth(self.iperm, dofmaps)
        self.w = pick_block(self.b, self.n)
        self.m = max(1, -(-self.b // self.w))
        self.nb = -(-self.n // self.w)
        self.n_pad = self.nb * self.w
        self.shift = shift
        if dtype is None:
            dtype = (jnp.float32 if jax.default_backend() == "tpu"
                     else jnp.float64)
        self.dtype = dtype
        self.perm_d = jnp.asarray(self.perm)
        self.iperm_d = jnp.asarray(self.iperm)

    def permute_ops(self, ops):
        return [(Ae, self.iperm_d[jnp.asarray(_dm_device(spec))])
                for Ae, spec in ops]

    def setup(self, ops, free=None):
        """ops: [(Ae, spec)] element blocks (specs may be spaces or raw
        dofmaps); free: optional strong-BC mask over ORIGINAL dof order."""
        fperm = None if free is None else jnp.asarray(free)[self.perm_d]
        R = assemble_block_band(
            self.permute_ops(ops), self.n, self.w, self.m, free=fperm,
            dtype=jnp.float64)
        Rs, s = equilibrate(R, self.w, self.m)
        Rs = Rs.astype(self.dtype)
        Ld, Lc = band_cholesky(Rs, self.w, self.m)
        if self.dtype == jnp.float64:
            state = {"Ld": Ld, "Lc": Lc, "s": s}
        else:
            # f32 breakdown guard: refactor once with a diagonal shift
            bad = ~jnp.isfinite(jnp.sum(Ld) + jnp.sum(Lc))

            def refactor(_):
                ridx = jnp.arange(self.w)
                Rsh = Rs.at[:, ridx, self.m * self.w + ridx].add(
                    jnp.asarray(self.shift, dtype=self.dtype))
                return band_cholesky(Rsh, self.w, self.m)

            Ld, Lc = jax.lax.cond(
                bad, refactor, lambda _: (Ld, Lc), operand=None)
            state = {"Ld": Ld, "Lc": Lc, "s": s}
        return state

    def apply(self, state, v):
        """x ~= A^{-1} v via the equilibrated factor: S (LL^T)^{-1} S v."""
        s = state["s"].astype(v.dtype)
        vp = v[self.perm_d]
        vp = jnp.pad(vp, (0, self.n_pad - self.n)) * s
        x = band_solve(state["Ld"], state["Lc"], vp.astype(self.dtype))
        x = x.astype(v.dtype) * s
        return x[:self.n][self.iperm_d]


def _dm_device(spec):
    return spec.dofmap if hasattr(spec, "dofmap") else spec


class BandPrecond:
    """Split-protocol preconditioner (ImplicitPDE staged path, see
    adjoint/implicit.py): factors the band Cholesky of the CURRENT
    linearization once per forward solve and hands the factor pytree to the
    adjoint through the custom_vjp residuals — the TPU-native equivalent of
    the reference reusing the MUMPS factorization for fwd AND adjoint
    (utils_dolfinx.py:495-531, state_operation.py:212-218)."""

    def __init__(self, space, dofmaps, free_mask=None, dtype=None,
                 shift=1e-5):
        self.band = BandCholPrecond(space, dofmaps, dtype=dtype, shift=shift)
        self.free_mask = free_mask
        self._specs = None  # set by the factory below (op layout)

    def prepare(self, params):
        return ()

    def setup_state(self, u, params, ops_Ae, aux):
        ops = list(zip(ops_Ae, self._specs))
        return self.band.setup(ops, free=self.free_mask)

    def apply_state(self, state, v):
        return self.band.apply(state, v)


def band_precond_factory(space, form, facet_forms=(), free_mask=None,
                         dtype=None, shift=1e-5):
    """Build a BandPrecond for a form + facet forms (the op layout matches
    ImplicitPDE._assemble_ops: fine operator first, then one block per
    facet group)."""
    dofmaps = [_dofmap_of(form.space)]
    specs = [form.space]
    for ff in facet_forms:
        for g in ff.groups:
            dofmaps.append(np.asarray(g["dofmap_d"]))
            specs.append(g["dofmap_d"])
    pc = BandPrecond(space, dofmaps, free_mask=free_mask, dtype=dtype,
                     shift=shift)
    pc._specs = specs
    return pc
