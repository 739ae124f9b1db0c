"""Solve-quality metrics that mean what they say.

The naive quality metric ||r||/||b|| saturates at eps*rho with
rho = |||A||u||| / ||b|| — the cancellation floor of EVALUATING the
residual — long before the solution stops improving. On the north-star
shell workload rho ~ 1.4e8, so the floor is ~1e-8 in true f64 and ~2e-7 in
the TPU's float-float f64 (2^-48); a SuperLU direct solve measures the
SAME floor (tools/floor_experiment.py). The metrics below are the standard
ones direct solvers report (MUMPS BERR; Oettli–Prager) plus the literal
BASELINE.md bar (nodal match against an f64 direct solve):

  eta    normwise backward error  ||r|| / (|||A||u||| + ||b||)
  omega  componentwise backward error  max_i |r_i| / (|A||u| + |b|)_i
  nodal  ||u - u_direct|| / ||u_direct||  vs host SuperLU (+1 refinement)

A backward-stable solve has eta/omega ~ unit roundoff of the arithmetic
the residual was EVALUATED in (device f64: 2^-53 CPU, ~2^-48 TPU).

Reference counterpart: the MUMPS solves behind every reference forward and
adjoint (femo_alpha/fea/utils_dolfinx.py:495-531) are judged by exactly
these backward-error measures (MUMPS RINFOG(7)/(8)).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def device_f64_eps() -> float:
    """Unit roundoff of the default backend's f64 arithmetic: true f64 on
    CPU/GPU; ~2^-48 on TPU, where XLA emulates f64 as a float-float pair
    of f32 words."""
    if jax.default_backend() == "tpu":
        return 2.0 ** -48
    return float(np.finfo(np.float64).eps)


def make_abs_matvec(pde):
    """x -> |A| @ |x| for an ImplicitPDE's current element operators: the
    row-magnitude scale against which residual cancellation is measured.
    Returns a traceable fn(ops_Ae, x). Point-load extra_residual terms are
    not included (they only ADD magnitude; the estimate stays a lower
    bound, which is the conservative direction for floor detection)."""
    from ..assembly.assemble import make_matvec, make_matvec_T

    lane = pde.solver_opts.get("op0_layout") == "lane"
    specs = pde._op_specs
    n = pde.n_dofs

    def abs_matvec(ops_Ae, x):
        ax = jnp.abs(x)
        a0 = jnp.abs(ops_Ae[0])
        if lane:
            y = make_matvec_T(a0, specs[0])(ax)
        else:
            y = make_matvec(a0, specs[0], n)(ax)
        for Ae, spec in zip(ops_Ae[1:], specs[1:]):
            y = y + make_matvec(jnp.abs(Ae), spec, n)(ax)
        return y

    return abs_matvec


def sparse_operator(op, params, u0=None):
    """Host-side scipy CSR of the CONSTRAINED operator
    B = f*A*f + (1-f)*I and the linear-problem RHS b = -residual(0)
    (adjoint/implicit.py BC convention). Setup-only: used by the direct
    cross-check and tests, never in a hot path."""
    import scipy.sparse as sp

    n = op.n_dofs
    if u0 is None:
        u0 = jnp.zeros(n)
    aux = op.prepare_aux(params)
    emf_basis, fops = aux[0], (aux[2] if len(aux) > 2 else None)
    ops_Ae = op._assemble_ops(u0, params, emf_basis=emf_basis,
                              facet_ops=fops)
    K = None
    specs = op._op_specs
    for k, (Ae, spec) in enumerate(zip(ops_Ae, specs)):
        Ae = np.asarray(Ae, dtype=np.float64)
        if k == 0 and op.solver_opts.get("op0_layout") == "lane":
            Ae = np.moveaxis(Ae, -1, 0)  # -> (nc, nd, nd)
        dm = np.asarray(spec.dofmap_d if hasattr(spec, "dofmap_d") else spec)
        nd = dm.shape[1]
        rows = np.repeat(dm, nd, axis=1).ravel()
        cols = np.tile(dm, (1, nd)).ravel()
        M = sp.csr_matrix((Ae.ravel(), (rows, cols)), shape=(n, n))
        K = M if K is None else K + M
    if op.extra_residual is not None:
        # extra_residual is load-like (point forces) in every current model:
        # state-INdependent, so it contributes to b, not to the operator.
        # Verify with one linearization probe and refuse silently-wrong
        # matrices otherwise.
        _, lin = jax.linearize(
            lambda v: op.extra_residual(v, params), jnp.zeros(n))
        probe = np.asarray(lin(jnp.ones(n)))
        if float(np.abs(probe).max()) > 0.0:
            raise NotImplementedError(
                "sparse_operator: state-dependent extra_residual is not "
                "representable here")
    free = np.asarray(op.free_mask, dtype=np.float64)
    D = sp.diags(free)
    B = (D @ K @ D + sp.diags(1.0 - free)).tocsc()
    b = -np.asarray(op.residual(u0, params), dtype=np.float64)
    return B, b


def backward_errors(B, b, u):
    """(eta, omega, rel_res) of u for the host sparse system."""
    u = np.asarray(u, dtype=np.float64)
    r = b - B @ u
    scale = abs(B) @ np.abs(u) + np.abs(b)
    omega = float(np.max(np.abs(r) / np.maximum(scale, 1e-300)))
    eta = float(np.linalg.norm(r) / max(float(np.linalg.norm(scale)),
                                        1e-300))
    rel = float(np.linalg.norm(r) / max(float(np.linalg.norm(b)), 1e-300))
    return eta, omega, rel


def direct_crosscheck(op, params, u, max_dofs=300_000):
    """The literal BASELINE.md bar: nodal agreement of `u` with a host f64
    SuperLU direct solve (+1 refinement step — MUMPS-class). Returns a dict
    with nodal errors and backward errors of both solutions, or
    {'skipped': reason} above `max_dofs` (direct factorization memory).
    """
    import scipy.sparse.linalg as spla

    if op.n_dofs > max_dofs:
        return {"skipped": f"n_dofs {op.n_dofs} > {max_dofs}"}
    B, b = sparse_operator(op, params)
    lu = spla.splu(B)
    ud = lu.solve(b)
    ud = ud + lu.solve(b - B @ ud)
    u = np.asarray(u, dtype=np.float64)
    eta_u, omega_u, rel_u = backward_errors(B, b, u)
    eta_d, omega_d, rel_d = backward_errors(B, b, ud)
    un = max(float(np.linalg.norm(ud)), 1e-300)
    return {
        "nodal_l2": float(np.linalg.norm(u - ud)) / un,
        "nodal_inf": float(np.max(np.abs(u - ud)))
        / max(float(np.max(np.abs(ud))), 1e-300),
        "eta": eta_u, "omega": omega_u, "rel_res": rel_u,
        "direct_eta": eta_d, "direct_omega": omega_d,
        "direct_rel_res": rel_d,
    }
