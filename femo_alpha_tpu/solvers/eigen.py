"""Generalized symmetric eigensolvers: K phi = lam M phi, smallest modes.

This fills the reference's modal-analysis slot the TPU-native way. The
reference pins SLEPc in its environment (environment.yml:77-78) but never
calls it; its only modal code is the dead `evaluate_modal_fea`
(rm_shell_model.py:284-361), which assembles one dense dK/dh and dM/dh
matrix PER THICKNESS DOF (self-reported ~7 GB for a 10x50 mesh). Here:

- `lobpcg`: matrix-free block LOBPCG (Knyazev) over the existing
  element-matrix matvecs, preconditioned by the library's solve-path
  preconditioners (geometric-MG V-cycle or RCM band Cholesky). Big block
  applies are jitted with static shapes; the small (<= 3k x 3k)
  Rayleigh-Ritz algebra runs eagerly so ill-conditioned basis columns can
  be dropped with dynamic shapes.
- `dense_generalized_eigh`: Cholesky reduction to a standard symmetric
  problem for small n (the dense-solver regime of LinearSolver).

Eigenvalue DERIVATIVES never materialize dK/dh or dM/dh: for a converged
pair the Rayleigh quotient lam(p) = phi^T K(p) phi / phi^T M(p) phi is
stationary in phi, so `jax.grad` of the assembled quotient at fixed phi is
the exact eigenvalue gradient (see RMShellModel.evaluate_modal).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def block_apply(mv):
    """Lift a vector matvec (n,)->(n,) to a block apply (n,k)->(n,k)."""
    return jax.vmap(mv, in_axes=1, out_axes=1)


def dense_generalized_eigh(Kd, Md, n_modes=None):
    """Smallest eigenpairs of the dense SPD pencil (Kd, Md) via Cholesky
    reduction: M = L L^T, eigh(L^-1 K L^-T), phi = L^-T v. Returns
    (lam (k,), Phi (n, k)) with Phi M-orthonormal."""
    from jax.scipy.linalg import solve_triangular

    L = jnp.linalg.cholesky(Md)
    Z = solve_triangular(L, Kd, lower=True)
    A = solve_triangular(L, Z.T, lower=True)
    A = 0.5 * (A + A.T)
    w, V = jnp.linalg.eigh(A)
    Phi = solve_triangular(L.T, V, lower=False)
    if n_modes is not None:
        w, Phi = w[:n_modes], Phi[:, :n_modes]
    return w, Phi


def _ritz(S, AS, BS, k, drop_tol=1e-12):
    """Rayleigh-Ritz on span(S): returns (theta (k,), C (m, k)) with C
    G_B-orthonormal, dropping near-dependent basis directions."""
    GA = S.T @ AS
    GB = S.T @ BS
    GA = 0.5 * (GA + GA.T)
    GB = 0.5 * (GB + GB.T)
    w, U = jnp.linalg.eigh(GB)
    keep = np.where(np.asarray(w) > drop_tol * float(w[-1]))[0]
    if keep.size < k:
        raise RuntimeError(
            f"LOBPCG basis collapsed: {keep.size} independent directions "
            f"for {k} requested modes"
        )
    Y = U[:, keep] / jnp.sqrt(w[keep])
    At = Y.T @ GA @ Y
    At = 0.5 * (At + At.T)
    theta, Z = jnp.linalg.eigh(At)
    C = Y @ Z[:, :k]
    return theta[:k], C


def lobpcg(A, B, X0, T=None, tol=1e-8, maxiter=200, free_mask=None):
    """Locally optimal block preconditioned CG for the k smallest eigenpairs
    of A x = lam B x (A, B symmetric; B positive definite on the free
    subspace).

    A, B, T: callables (n,) -> (n,) (T approximates A^-1; defaults to
    identity). X0: (n, k) initial block. free_mask: constrained dofs are
    projected out of every block (columns live in the free subspace).

    Returns (lam (k,), X (n, k), resnorms (k,), iters). X is B-orthonormal.
    Host-driven loop: the O(n k) block applies are jitted with static
    shapes; the O(k^3) Rayleigh-Ritz runs eagerly (dynamic basis pruning).

    The relative-residual floor of a small eigenvalue is ~eps*lam_max/lam_i
    (the roundoff of A@x carries the full operator scale), which can sit
    above a tight tol; the loop therefore tracks the best-so-far block and
    returns it once max(res) stagnates for `stall` iterations. Ritz values
    converge as res^2, so eigenvalues are far more accurate than res.
    """
    stall = 10
    X = jnp.asarray(X0)
    n, k = X.shape
    proj = None
    if free_mask is not None:
        fm = jnp.asarray(free_mask).reshape(n, 1)
        proj = lambda V: fm * V  # noqa: E731
        X = proj(X)
    bA = jax.jit(block_apply(A))
    bB = jax.jit(block_apply(B))
    bT = jax.jit(block_apply(T)) if T is not None else (lambda V: V)

    # B-orthonormalize the start block
    BX = bB(X)
    _, C = _ritz(X, bA(X), BX, k)
    P = AP = BP = None
    X = X @ C
    AX, BX = bA(X), bB(X)
    lam = jnp.sum(X * AX, axis=0)
    res = jnp.ones(k)
    best = None
    best_it = 0
    it = 0
    for it in range(1, maxiter + 1):
        R = AX - BX * lam[None, :]
        denom = (jnp.linalg.norm(AX, axis=0)
                 + jnp.abs(lam) * jnp.linalg.norm(BX, axis=0))
        res = jnp.linalg.norm(R, axis=0) / jnp.maximum(denom, 1e-300)
        if best is None or float(jnp.max(res)) < float(jnp.max(best[2])):
            best = (lam, X, res)
            best_it = it
        if bool(jnp.all(res < tol)):
            best = (lam, X, res)
            break
        if it - best_it >= stall:
            break
        # soft locking: converged columns contribute no new search
        # directions — their preconditioned residuals are pure roundoff
        # noise, and mixing noise into the Rayleigh-Ritz basis DEGRADES
        # already-converged modes (observed: res 5e-10 -> 1e-4 within a few
        # iterations without locking). Zeroed columns fall below the Gram
        # drop tolerance and leave the basis.
        active = (res >= tol).astype(X.dtype)[None, :]
        W = bT(R) * active
        if proj is not None:
            W = proj(W)
        # B-orthogonalize W against X: near convergence W turns nearly
        # parallel to X, flooring the Gram conditioning at ~sqrt(eps)
        # (what scipy's lobpcg also projects out)
        W = W - X @ (BX.T @ W)
        # normalize W columns for Gram conditioning
        wn = jnp.maximum(jnp.linalg.norm(W, axis=0), 1e-300)
        W = W / wn[None, :] * active
        AW, BW = bA(W), bB(W)
        if P is None:
            S, AS, BS = (jnp.hstack([X, W]), jnp.hstack([AX, AW]),
                         jnp.hstack([BX, BW]))
        else:
            S, AS, BS = (jnp.hstack([X, W, P]), jnp.hstack([AX, AW, AP]),
                         jnp.hstack([BX, BW, BP]))
        lam, C = _ritz(S, AS, BS, k)
        # new X from the Ritz combination; P = the W/P component (classical
        # LOBPCG three-term recurrence), B-normalized
        Cp = C.at[:k].set(0.0)
        Xn, AXn, BXn = S @ C, AS @ C, BS @ C
        Pn, APn, BPn = S @ Cp, AS @ Cp, BS @ Cp
        pn = jnp.sqrt(jnp.maximum(jnp.sum(Pn * BPn, axis=0), 1e-300))
        P, AP, BP = (Pn / pn * active, APn / pn * active,
                     BPn / pn * active)
        X, AX, BX = Xn, AXn, BXn
    lam, X, res = best
    return lam, X, res, it
