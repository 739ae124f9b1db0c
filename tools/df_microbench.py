"""Measure float-float (dfloat) vs XLA software-f64 for the outer-CG ops,
on whatever backend is active — the measurement behind the wire-or-drop
decision recorded in COVERAGE.md.

Ops timed (the outer CG's per-iteration cost pie, see COVERAGE.md
"Performance state"):
  vdot   : f64 jnp.vdot  vs df_dot        (vector sizes ~63k and ~1M)
  axpy   : f64 a*x+y     vs df_axpy
  matvec : cell_matvec_T f64 vs df_cell_matvec_T vs f32 (bandwidth floor;
           nd=39, nc=4096 / 25k — the 63k- and 1M-dof bench meshes)

Run:  python tools/df_microbench.py            (TPU via the axon tunnel)
      FEMO_PLATFORM=cpu python tools/df_microbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import femo_alpha_tpu  # noqa: F401  (platform + x64 + matmul precision)
import jax
import jax.numpy as jnp

from femo_alpha_tpu.assembly.assemble import cell_matvec_T
from femo_alpha_tpu.solvers.dfloat import (
    DF, df_axpy, df_cell_matvec_T, df_dot, df_from_f64, df_to_f64)


def timeit(fn, *args, repeats=20):
    # sync() forces a device->host fetch per call: on the tunneled TPU
    # platform, block_until_ready alone can return before queued work
    # executes until the process's first transfer (utils/timing.py)
    from femo_alpha_tpu.utils.timing import ensure_eager_stream, sync
    ensure_eager_stream()
    out = sync(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    results = {}

    for n in (63_000, 1_000_000):
        x64 = jnp.asarray(rng.standard_normal(n))
        y64 = jnp.asarray(rng.standard_normal(n))
        xdf = df_from_f64(x64)
        ydf = df_from_f64(y64)
        a64 = jnp.asarray(0.731)
        adf = df_from_f64(a64)

        dot64 = jax.jit(lambda x, y: jnp.vdot(x, y))
        dotdf = jax.jit(df_dot)
        axpy64 = jax.jit(lambda a, x, y: a * x + y)
        axpydf = jax.jit(df_axpy)

        t_d64 = timeit(dot64, x64, y64)
        t_ddf = timeit(dotdf, xdf, ydf)
        t_a64 = timeit(axpy64, a64, x64, y64)
        t_adf = timeit(axpydf, adf, xdf, ydf)
        err = abs(float(df_to_f64(dotdf(xdf, ydf)) - dot64(x64, y64))
                  / float(dot64(x64, y64)))
        print(f"n={n:>9}: vdot f64 {t_d64:7.3f} ms  df {t_ddf:7.3f} ms "
              f"({t_d64/t_ddf:4.2f}x, df rel err {err:.1e}) | "
              f"axpy f64 {t_a64:7.3f} ms  df {t_adf:7.3f} ms "
              f"({t_a64/t_adf:4.2f}x)")
        results[f"vdot_{n}"] = (t_d64, t_ddf)
        results[f"axpy_{n}"] = (t_a64, t_adf)

    nd = 39
    for nc in (4096, 25_000):
        Ae64 = jnp.asarray(rng.standard_normal((nd, nd, nc)))
        xc64 = jnp.asarray(rng.standard_normal((nd, nc)))
        Aedf = df_from_f64(Ae64)
        xcdf = df_from_f64(xc64)
        Ae32 = Ae64.astype(jnp.float32)
        xc32 = xc64.astype(jnp.float32)

        mv64 = jax.jit(cell_matvec_T)
        mvdf = jax.jit(df_cell_matvec_T)
        mv32 = jax.jit(cell_matvec_T)

        t64 = timeit(mv64, Ae64, xc64, repeats=10)
        tdf = timeit(mvdf, Aedf, xcdf, repeats=10)
        t32 = timeit(mv32, Ae32, xc32, repeats=10)
        ref = np.asarray(mv64(Ae64, xc64))
        got = np.asarray(df_to_f64(mvdf(Aedf, xcdf)))
        err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        gb = nd * nd * nc * 8 / 1e9
        print(f"cell_matvec_T nd={nd} nc={nc:>6} (Ae {gb:.2f} GB): "
              f"f64 {t64:7.3f} ms  df {tdf:7.3f} ms ({t64/tdf:4.2f}x, "
              f"rel err {err:.1e})  f32-floor {t32:7.3f} ms "
              f"[f64 BW {gb/t64*1e3:5.1f} GB/s]")
        results[f"matvec_{nc}"] = (t64, tdf, t32)

    return results


if __name__ == "__main__":
    main()
