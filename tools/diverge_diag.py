"""Pinpoint the 988k MG-CG divergence: operator wrong, preconditioner
wrong, or arithmetic breakdown?

Checks, in order (all on the REAL product-path state at nx x ny):
  1. operator truth:   device constrained matvec vs host-f64 linearized
                       residual on a fixed probe vector
  2. V-cycle health:   contraction factor ||b - A M b|| / ||b|| of one
                       preconditioned Richardson step (must be < 1 for a
                       useful MG; >> 1 = divergent cycle)
  3. V-cycle symmetry: <r1, M r2> vs <M r1, r2> (CG requires symmetric M)
  4. PCG trace:        24 hand-rolled df-PCG iterations printing the
                       recurrence AND true residual every iteration

Usage: python tools/diverge_diag.py [nx ny]   (default 512 128)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    from femo_alpha_tpu.benchmarks import LibraryBench
    from femo_alpha_tpu.utils.offload import run_setup

    b = LibraryBench(nx=nx, ny=ny)
    op = b.model.fea.states["disp_solid"].pde
    hl = op._hostloop
    params = {"thickness": b.th0, "E": b.E, "nu": b.nu,
              "uhat": jnp.zeros_like(b.f), "F_solid": b.f}
    n = op.n_dofs
    u0 = jnp.zeros(n)
    aux = op._prepare_aux(params)
    u, ops_Ae, M_state = hl._asm_affine(params, u0, aux)
    f = op.free_mask

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(n)
    x = jnp.asarray(x_np)

    # ---- 1. operator truth
    @jax.jit
    def dev_mv(params, u, ops_Ae, M_state, x):
        solver = op._solver_from(ops_Ae, M_state, u, params)
        return solver.matvec(x)

    y_dev = np.asarray(dev_mv(params, u, ops_Ae, M_state, x),
                       dtype=np.float64)

    def host_Ax(p, x):
        fx = f * x
        r1 = op.residual((1.0 - f) * op.bc_vals + fx, p)
        r0 = op.residual((1.0 - f) * op.bc_vals, p)
        return f * (r1 - r0) + (1.0 - f) * x

    y_host = np.asarray(
        run_setup(jax.jit(host_Ax), hl._params_host(params),
                  x_np), dtype=np.float64)
    num = float(np.linalg.norm(y_dev - y_host))
    den = float(np.linalg.norm(y_host))
    print(json.dumps({"check": "operator", "rel_err": num / den,
                      "dev_norm": float(np.linalg.norm(y_dev)),
                      "host_norm": den}), flush=True)

    # ---- 2./3. V-cycle health + symmetry
    @jax.jit
    def vcyc(params, u, ops_Ae, M_state, v):
        solver = op._solver_from(ops_Ae, M_state, u, params)
        return solver.M(v)

    r1 = jnp.asarray(rng.standard_normal(n)) * f
    r2 = jnp.asarray(rng.standard_normal(n)) * f
    Mr1 = vcyc(params, u, ops_Ae, M_state, r1)
    Mr2 = vcyc(params, u, ops_Ae, M_state, r2)
    s12 = float(jnp.vdot(r1, Mr2))
    s21 = float(jnp.vdot(Mr1, r2))
    pos = float(jnp.vdot(r1, Mr1))
    bvec = f * jnp.asarray(-np.asarray(
        run_setup(jax.jit(lambda p: op.residual((1.0 - f) * op.bc_vals, p)),
                  hl._params_host(params)), dtype=np.float64))
    Mb = vcyc(params, u, ops_Ae, M_state, bvec)
    AMb = dev_mv(params, u, ops_Ae, M_state, Mb)
    contr = float(jnp.linalg.norm(bvec - AMb) / jnp.linalg.norm(bvec))
    print(json.dumps({"check": "vcycle",
                      "richardson_contraction": contr,
                      "sym_rel": abs(s12 - s21) / max(abs(s12), 1e-300),
                      "posdef_rMr": pos}), flush=True)

    # ---- 4. PCG trace (chunked 1-iteration programs, df arithmetic like
    # the product solve)
    from femo_alpha_tpu.solvers.linear import _use_df_vectors

    use_df = _use_df_vectors(bvec.dtype)
    print(json.dumps({"check": "pcg", "use_df": bool(use_df)}), flush=True)
    z, rz, bnorm = hl._start(params, u, ops_Ae, M_state, bvec)
    run1 = hl._chunk_prog(hl._SIZES[0], use_df)
    if use_df:
        from femo_alpha_tpu.solvers.dfloat import df_from_f64, df_to_f64

        xk, r, zk, p = (df_from_f64(v) for v in
                        (jnp.zeros_like(bvec), bvec, z, z))
    else:
        xk, r, zk, p = jnp.zeros_like(bvec), bvec, z, z
    bn = float(bnorm)
    for it in range(12):
        xk, r, zk, p, rz, rn, na = run1(params, u, ops_Ae, M_state,
                                        xk, r, zk, p, rz,
                                        jnp.asarray(1e-300))
        x64 = df_to_f64(xk) if use_df else xk
        rt, _, _, rtn = hl._true_res(params, u, ops_Ae, M_state, x64, bvec)
        print(json.dumps({
            "it": (it + 1) * hl._SIZES[0],
            "recurrence_rel": float(rn) / bn,
            "true_rel": float(rtn) / bn}), flush=True)


if __name__ == "__main__":
    main()
