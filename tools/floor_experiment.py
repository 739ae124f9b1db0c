"""Root-cause experiment for the rel_res floor (round-3 VERDICT item 2).

Question: is the ~1e-8 (CPU f64) / ~2.2e-7 (TPU float-float) relative
residual a SOLVER failure or a MEASUREMENT floor?

Method (CPU, f64): build the north-star shell system, assemble the exact
sparse matrix K and RHS b from the element matrices, factorize with scipy
SuperLU (the same class of solver as the reference's MUMPS,
/root/reference/femo_alpha/fea/utils_dolfinx.py:495-531), and measure

  (a) rel_res of the SuperLU solution through the SAME assembly-true
      residual used by the bench — if the direct solve also shows ~1e-8,
      the metric has hit the f64 cancellation floor eps*rho, and no solver
      (including MUMPS) can show better;
  (b) the nodal agreement between the CG(+MG) solution and the SuperLU
      solution — the BASELINE.md bar is "match dolfinx nodal solutions to
      1e-8", which is a statement about (b), not (a);
  (c) the floor predictors: rho = |||K||u|||/||b|| (residual-evaluation
      cancellation) and an estimate of eps*kappa (CG attainable accuracy).

Run: FEMO_PLATFORM=cpu python tools/floor_experiment.py [nx ny]
"""

import os
import sys

os.environ.setdefault("FEMO_PLATFORM", "cpu")

import numpy as np  # noqa: E402


def main(nx=64, ny=16):
    import jax  # noqa: F401
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from femo_alpha_tpu.benchmarks import LibraryBench

    b_ = LibraryBench(nx=nx, ny=ny)
    model = b_.model
    op = model.fea.states["disp_solid"].pde
    th = b_.th0
    params = {"thickness": th, "E": b_.E, "nu": b_.nu,
              "uhat": jnp.zeros_like(b_.f), "F_solid": b_.f}
    n = op.n_dofs

    # --- run the product solve (CG+MG staged path) ---
    out = b_.forward_adjoint(th)
    u_cg = np.asarray(out["u"], dtype=np.float64)

    # --- exact sparse K and b from the framework's own element ops ---
    aux = op.prepare_aux(params)
    emf_basis, _ = aux
    u0 = jnp.zeros(n)
    ops_Ae = op._assemble_ops(u0, params, emf_basis=emf_basis)
    Ae0 = np.asarray(ops_Ae[0])
    if op.solver_opts.get("op0_layout") == "lane":
        Ae0 = np.moveaxis(Ae0, -1, 0)  # (nc, nd, nd)
    dm = np.asarray(op.form.space.dofmap_d)
    nc, nd = dm.shape
    rows = np.repeat(dm, nd, axis=1).ravel()
    cols = np.tile(dm, (1, nd)).ravel()
    K = sp.csr_matrix((Ae0.ravel(), (rows, cols)), shape=(n, n))
    free = np.asarray(op.free_mask)
    # constrained operator: B = f*K*f + (1-f)*I  (adjoint/implicit.py BC)
    D = sp.diags(free)
    B = (D @ K @ D + sp.diags(1.0 - free)).tocsc()
    r0 = np.asarray(op.residual(u0, params))  # = K*0 - b rows (+BC rows)
    b = -r0  # linear problem: residual(u) = B u - b (in constrained form)

    # --- SuperLU (MUMPS-class direct) solve ---
    lu = spla.splu(B)
    u_lu = lu.solve(b)

    # one step of f64 iterative refinement on the direct solve, so u_lu is
    # as exact as f64 allows
    r = b - B @ u_lu
    u_lu = u_lu + lu.solve(r)

    # --- measurements ---
    def assembly_rel(u):
        rn = float(jnp.linalg.norm(op.residual(jnp.asarray(u), params)))
        return rn / max(float(np.linalg.norm(b)), 1e-300)

    def sparse_rel(u):
        return float(np.linalg.norm(b - B @ u) / np.linalg.norm(b))

    rel_cg_asm = assembly_rel(u_cg)
    rel_lu_asm = assembly_rel(u_lu)
    rel_cg_sp = sparse_rel(u_cg)
    rel_lu_sp = sparse_rel(u_lu)
    nodal = float(np.linalg.norm(u_cg - u_lu) / np.linalg.norm(u_lu))
    nodal_inf = float(np.max(np.abs(u_cg - u_lu))
                      / np.max(np.abs(u_lu)))

    # floor predictors
    absK = abs(B)
    rho = float(np.linalg.norm(absK @ np.abs(u_lu)) / np.linalg.norm(b))
    eps = np.finfo(np.float64).eps
    # componentwise (Oettli-Prager) backward error of each solution
    denom = absK @ np.abs(u_lu) + np.abs(b)
    omega_lu = float(np.max(np.abs(b - B @ u_lu) / np.maximum(denom, 1e-300)))
    omega_cg = float(np.max(np.abs(b - B @ u_cg) / np.maximum(denom, 1e-300)))

    print(f"n_dofs {n}  nnz {B.nnz}")
    print(f"CG+MG   : assembly-rel {rel_cg_asm:.3e}  sparse-rel "
          f"{rel_cg_sp:.3e}  omega {omega_cg:.3e}")
    print(f"SuperLU : assembly-rel {rel_lu_asm:.3e}  sparse-rel "
          f"{rel_lu_sp:.3e}  omega {omega_lu:.3e}")
    print(f"nodal ||u_cg - u_lu||/||u_lu||: l2 {nodal:.3e}  "
          f"inf {nodal_inf:.3e}")
    print(f"rho = |||K||u|||/||b|| = {rho:.3e}   predicted eval floor "
          f"eps*rho = {eps * rho:.3e}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args) if args else main()
