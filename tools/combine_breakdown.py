"""Where does the per-iteration affine re-assembly time go on TPU?

Times, at the bench mesh sizes, each stage of the df affine combine
(assembly/affine.py _affine_combine storage='df'):
  mul_add : df_mul(B_k, c_k) + df_add, emitting the (hi, lo) PAIR
  to_f64  : the pair -> f64 conversion alone
  full    : the production combine (mul_add + to_f64 fused by XLA)
plus the end-to-end _assemble_ops program the bench metric measures.

Decides whether a Pallas fused-combine kernel (or a pair-native operator)
is worth building: if to_f64 dominates, fusing the arithmetic gains
nothing — the f64 materialization is the wall.

Usage: python tools/combine_breakdown.py [nx ny]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, repeats=12):
    from femo_alpha_tpu.utils.timing import ensure_eager_stream, sync

    ensure_eager_stream()
    sync(fn(*args))
    # pipelined: dispatch all, sync once (matches the bench metric)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(repeats)]
    sync(outs)
    return (time.perf_counter() - t0) / repeats * 1e3


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from femo_alpha_tpu.benchmarks import LibraryBench
    from femo_alpha_tpu.solvers.dfloat import DF, df_add, df_mul, df_to_f64

    b = LibraryBench(nx=nx, ny=ny)
    op = b.model.fea.states["disp_solid"].pde
    params = {"thickness": b.th0, "E": b.E, "nu": b.nu,
              "uhat": jnp.zeros_like(b.f), "F_solid": b.f}
    emf = op.element_matrices_fn
    basis = emf.prepare(params)
    th = b.th0
    assert isinstance(basis, DF), type(basis)
    K = basis.hi.shape[0]
    powers = emf.powers
    nbytes = 2 * basis.hi.nbytes

    @jax.jit
    def mul_add(basis, th):
        th64 = th.astype(jnp.float64)
        out = None
        from femo_alpha_tpu.solvers.dfloat import df_from_f64

        for k, p in enumerate(powers):
            c = df_from_f64(th64 ** p)
            cb = DF(c.hi[None, None, :], c.lo[None, None, :])
            term = df_mul(DF(basis.hi[k], basis.lo[k]), cb)
            out = term if out is None else df_add(out, term)
        return out

    @jax.jit
    def full(basis, th):
        return df_to_f64(mul_add(basis, th))

    pair = jax.block_until_ready(mul_add(basis, th))

    @jax.jit
    def to64(pair):
        return df_to_f64(pair)

    u0 = jnp.zeros(op.n_dofs)

    @jax.jit
    def asm(th, basis):
        p = dict(params)
        p["thickness"] = th
        return op._assemble_ops(u0, p, emf_basis=basis)

    res = {
        "n_dofs": int(op.n_dofs),
        "basis_bytes_MB": round(nbytes / 1e6, 1),
        "mul_add_ms": round(timeit(mul_add, basis, th), 2),
        "to_f64_ms": round(timeit(to64, pair), 2),
        "full_combine_ms": round(timeit(full, basis, th), 2),
        "assemble_ops_ms": round(timeit(asm, th, basis), 2),
    }
    res["mul_add_GBps"] = round(nbytes / res["mul_add_ms"] / 1e6, 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
