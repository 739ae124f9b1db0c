"""Diagnose the 988k-dof MG V-cycle divergence (round-4: scale-point
rel_res 1.0): is the fine-level Chebyshev lambda_max estimate (25 power
iterations, 1.05 margin) an UNDERESTIMATE at scale?

A degree-6 Chebyshev smoother amplifies eigenmodes ABOVE its target
interval by cosh(6*arccosh(lambda/lmax)) per sweep — a 20% lmax
underestimate amplifies ~12x per application, making the V-cycle
indefinite and PCG diverge. This tool builds the bench model at a given
size, extracts the MG state the product path actually uses, and re-runs
the power iteration far longer at every level, printing est(k)/est(long).

Usage: python tools/lmax_experiment.py [nx ny]  (default 512 128)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    from femo_alpha_tpu.benchmarks import LibraryBench
    from femo_alpha_tpu.solvers.multigrid import estimate_lmax

    b = LibraryBench(nx=nx, ny=ny)
    op = b.model.fea.states["disp_solid"].pde
    hl = op._hostloop
    params = {"thickness": b.th0, "E": b.E, "nu": b.nu,
              "uhat": jnp.zeros_like(b.f), "F_solid": b.f}
    u0 = jnp.zeros(op.n_dofs)
    aux = op._prepare_aux(params)
    # build the REAL preconditioner state through the product path
    u, ops_Ae, M_state = hl._asm_affine(params, u0, aux)
    mg = op._pc.mg
    state = M_state

    print(json.dumps({"n_dofs": op.n_dofs, "levels": len(mg.levels),
                      "cycle": mg.cycle, "degree": str(mg.degree),
                      "power_iters": mg.power_iters}), flush=True)

    import functools

    for k in range(len(mg.levels) - 1):
        lev = mg.levels[k]
        W = lev["space"]
        Ae = state["Ae"][k]
        free_k = lev["free"].astype(Ae.dtype)
        sm = state["blocks"][k]
        dt = Ae.dtype
        n_ = int(W.n_dofs)

        # Ae/sm as runtime ARGS: closing over them embeds ~400MB constants
        # in the remote-compile payload (HTTP 413 on the tunneled backend)
        @functools.partial(jax.jit, static_argnames=("iters",))
        def power_run(Ae, sm, iters, W=W, free_k=free_k, n_=n_, dt=dt):
            mv = mg.make_matvec(Ae, W, free_k)
            Minv = lambda v: mg._smoother_apply(W, sm, v)  # noqa: E731
            x = jnp.sin(jnp.arange(1, n_ + 1, dtype=dt) * 0.7) + 0.01

            def body(_, x):
                y = Minv(mv(x))
                return y / jnp.linalg.norm(y)

            x = jax.lax.fori_loop(0, iters, body, x)
            y = Minv(mv(x))
            return jnp.vdot(x, y) / jnp.vdot(x, x)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def lanczos_run(Ae, sm, iters, W=W, free_k=free_k, n_=n_, dt=dt):
            mv = mg.make_matvec(Ae, W, free_k)
            Minv = lambda v: mg._smoother_apply(W, sm, v)  # noqa: E731
            return estimate_lmax(mv, Minv, n_, dt, iters=iters)

        stored = float(state["lmax"][k])
        row = {"level": k, "n": n_, "stored_lmax": stored}
        for iters in (25, 100, 400):
            row[f"power_{iters}"] = float(power_run(Ae, sm, iters))
        row[f"lanczos_{mg.power_iters}"] = float(
            lanczos_run(Ae, sm, mg.power_iters))
        row["power25_under_by"] = row["power_400"] / max(
            row["power_25"], 1e-30)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
