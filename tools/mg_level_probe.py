"""Per-level MG health probe for the 988k V-cycle divergence.

For each level k of the product hierarchy:
  - transfer adjointness:   <P xc, yf> vs <xc, R yf>      (must match)
  - smoother symmetry:      <v1, S v2> vs <S v1, v2>      (must match)
  - smoother positivity:    <v, S v> > 0
  - Chebyshev safety:       contraction of k-th level smoothing on a
                            random vector: ||b - A chebyshev(b)|| / ||b||
  - two-grid contraction at level k (smooth + exact-ish coarse correction
    via the REST of the V-cycle): ||b - A TG(b)|| / ||b||

Usage: python tools/mg_level_probe.py [nx ny]
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
    from femo_alpha_tpu.solvers.multigrid import chebyshev_smooth

    b = LibraryBench(nx=nx, ny=ny)
    op = b.model.fea.states["disp_solid"].pde
    hl = op._hostloop
    params = {"thickness": b.th0, "E": b.E, "nu": b.nu,
              "uhat": jnp.zeros_like(b.f), "F_solid": b.f}
    u0 = jnp.zeros(op.n_dofs)
    aux = op._prepare_aux(params)
    u, ops_Ae, state = hl._asm_affine(params, u0, aux)
    mg = op._pc.mg
    rng = np.random.default_rng(1)

    for k in range(len(mg.levels)):
        lev = mg.levels[k]
        W = lev["space"]
        n = int(W.n_dofs)
        Ae = state["Ae"][k]
        dt = Ae.dtype
        free_k = lev["free"].astype(dt)
        row = {"level": k, "n": n}
        if k < len(mg.levels) - 1:
            sm = state["blocks"][k]
            lmax = state["lmax"][k]
            nc = int(mg.levels[k + 1]["space"].n_dofs)
            free_c = mg.levels[k + 1]["free"].astype(dt)
            t = mg.transfers[k]
            xc = jnp.asarray(rng.standard_normal(nc), dtype=dt)
            yf = jnp.asarray(rng.standard_normal(n), dtype=dt)

            @jax.jit
            def adj(Ae, xc, yf, t=t):
                a = jnp.vdot(t.prolong(xc), yf)
                b_ = jnp.vdot(xc, t.restrict(yf))
                return a, b_

            a, b_ = adj(Ae, xc, yf)
            row["transfer_adj_rel"] = float(
                abs(a - b_) / max(abs(float(a)), 1e-300))

            v1 = jnp.asarray(rng.standard_normal(n), dtype=dt) * free_k
            v2 = jnp.asarray(rng.standard_normal(n), dtype=dt) * free_k

            @jax.jit
            def smsym(sm, v1, v2, W=W):
                s1 = mg._smoother_apply(W, sm, v1)
                s2 = mg._smoother_apply(W, sm, v2)
                return (jnp.vdot(v1, s2), jnp.vdot(s1, v2),
                        jnp.vdot(v1, s1))

            s12, s21, pos = smsym(sm, v1, v2)
            row["smoother_sym_rel"] = float(
                abs(s12 - s21) / max(abs(float(s12)), 1e-300))
            row["smoother_pos"] = float(pos)

            @jax.jit
            def cheb_contr(Ae, sm, lmax, v1, W=W, free_k=free_k, k=k):
                mv = mg.make_matvec(Ae, W, free_k)
                Minv = lambda v: mg._smoother_apply(W, sm, v)  # noqa
                x = chebyshev_smooth(mv, Minv, lmax, v1,
                                     jnp.zeros_like(v1),
                                     degree=mg._degree_at(k),
                                     lmin_ratio=mg.lmin_ratio)
                return (jnp.linalg.norm(v1 - mv(x)),
                        jnp.linalg.norm(v1))

            rn, bn = cheb_contr(Ae, sm, lmax, v1)
            row["cheb_contraction"] = float(rn) / float(bn)
            row["lmax"] = float(lmax)

            # sub-V-cycle contraction from level k down
            @jax.jit
            def sub_contr(state, v1, k=k, W=W, free_k=free_k):
                mv = mg.make_matvec(state["Ae"][k], W, free_k)
                x = mg._cycle(state, k, v1)
                return (jnp.linalg.norm(v1 - mv(x)),
                        jnp.linalg.norm(v1))

            rn, bn = sub_contr(state, v1)
            row["subcycle_contraction"] = float(rn) / float(bn)
        else:
            v1 = jnp.asarray(rng.standard_normal(n), dtype=dt) * free_k

            @jax.jit
            def coarse_contr(state, v1, k=k, W=W, free_k=free_k):
                mv = mg.make_matvec(state["Ae"][k], W, free_k)
                x = mg._cycle(state, k, v1)
                return (jnp.linalg.norm(v1 - mv(x)),
                        jnp.linalg.norm(v1))

            rn, bn = coarse_contr(state, v1)
            row["coarse_solve_rel_res"] = float(rn) / float(bn)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
