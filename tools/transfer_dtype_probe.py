"""Isolate the f32-vs-f64 transfer adjointness discrepancy at 988k:
same MixedTransfer object, same random data, f32 vs f64, mixed vs
per-subspace, jitted vs eager.

Usage: python tools/transfer_dtype_probe.py [nx ny]
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

    b = LibraryBench(nx=nx, ny=ny)
    op = b.model.fea.states["disp_solid"].pde
    mg = op._pc.mg
    rng = np.random.default_rng(7)

    for k in (0, 1):
        t = mg.transfers[k]
        nf = int(mg.levels[k]["space"].n_dofs)
        nc = int(mg.levels[k + 1]["space"].n_dofs)
        xc_np = rng.standard_normal(nc)
        yf_np = rng.standard_normal(nf)
        for dt in (jnp.float32, jnp.float64):
            xc = jnp.asarray(xc_np, dtype=dt)
            yf = jnp.asarray(yf_np, dtype=dt)

            @jax.jit
            def adj(xc, yf):
                return t.prolong(xc), t.restrict(yf)

            Px, Ry = adj(xc, yf)
            # dot in f64 NUMPY so only the transfer itself is under test
            Px = np.asarray(Px, dtype=np.float64)
            Ry = np.asarray(Ry, dtype=np.float64)
            a = float(Px @ yf_np)
            b_ = float(xc_np @ Ry)
            # also compare f32 prolong against f64 prolong directly
            print(json.dumps({
                "level": k, "dtype": str(dt.__name__),
                "adj_rel": abs(a - b_) / max(abs(a), 1e-300),
                "P_norm": float(np.linalg.norm(Px)),
                "R_norm": float(np.linalg.norm(Ry))}), flush=True)
        # cross-dtype prolong comparison
        Px32 = np.asarray(jax.jit(t.prolong)(
            jnp.asarray(xc_np, dtype=jnp.float32)), dtype=np.float64)
        Px64 = np.asarray(jax.jit(t.prolong)(
            jnp.asarray(xc_np, dtype=jnp.float64)), dtype=np.float64)
        Ry32 = np.asarray(jax.jit(t.restrict)(
            jnp.asarray(yf_np, dtype=jnp.float32)), dtype=np.float64)
        Ry64 = np.asarray(jax.jit(t.restrict)(
            jnp.asarray(yf_np, dtype=jnp.float64)), dtype=np.float64)
        print(json.dumps({
            "level": k,
            "prolong_f32_vs_f64": float(np.linalg.norm(Px32 - Px64)
                                        / np.linalg.norm(Px64)),
            "restrict_f32_vs_f64": float(np.linalg.norm(Ry32 - Ry64)
                                         / np.linalg.norm(Ry64))}),
            flush=True)


if __name__ == "__main__":
    main()
