"""Unstructured-workload benchmark: penalty-BC wing shell (the reference's
pav/c172 aircraft configuration, solved by MUMPS there) through the
library path — RMShellModel.evaluate + jax.grad over the RCM band-Cholesky
solver and the generic index-gather assembly.

This is the scale point for the UNSTRUCTURED pipeline (the headline
bench.py measures the structured fast path + geometric MG); run on CPU and
on TPU to compare. Prints one JSON line:
  {"metric": "wing_fwd_adjoint_<ndofs>dofs_wall", "value": ..., "unit": "s",
   "n_cells": ..., "backend": ..., "compile_s": ...}

Size knobs: FEMO_WING_CHORD / FEMO_WING_SPAN (default 18 x 66 with two rib
stations ~ pav-scale 2,374-quad wing, SURVEY.md §6).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import femo_alpha_tpu  # noqa: F401  (platform/x64 config)
    from femo_alpha_tpu.mesh import createWingShellMesh
    from femo_alpha_tpu.models import RMShellModel

    jax.devices()
    # liveness marker for init-hang watchdogs (the tunneled backend hangs
    # ~50% of process inits during degradation; see bench.py _probe_backend)
    print("FEMOLIFE", file=sys.stderr, flush=True)

    n_chord = int(os.environ.get("FEMO_WING_CHORD", "18"))
    n_span = int(os.environ.get("FEMO_WING_SPAN", "66"))
    mesh = createWingShellMesh(
        n_chord=n_chord, n_span=n_span,
        rib_stations=(n_span // 3, 2 * n_span // 3), shuffle_seed=3)
    nel, nn = mesh.n_cells, mesh.n_nodes
    model = RMShellModel(mesh, shell_bc_func=lambda x: x[:, 1] < 1e-9,
                         element_wise_material=True, record=False)
    assert model.PENALTY_BC and not getattr(mesh, "structured", False)
    n_dofs = model.shell_pde.W.n_dofs

    span = float(np.max(mesh.coords[:, 1]))
    eta = np.clip(np.asarray(mesh.coords[:, 1]) / span, 0.0, 1.0)
    pressure = np.zeros((nn, 3))
    pressure[:, 2] = 2000.0 * np.sqrt(1.0 - eta**2)
    pressure = jnp.asarray(pressure)
    base = dict(E=jnp.full(nel, 69e9), nu=jnp.full(nel, 0.33),
                density=jnp.full(nel, 2700.0))

    def obj(th):
        out = model.evaluate(pressure, thickness=th, is_pressure=True,
                             **base)
        return jnp.reshape(out.compliance, ()), out

    def run(th):
        (c, out), g = jax.value_and_grad(obj, has_aux=True)(th)
        jax.block_until_ready(g)
        return float(c), out, np.asarray(g)

    th0 = jnp.full(nel, 0.006)
    t0 = time.perf_counter()
    c, out, g = run(th0)
    first = time.perf_counter() - t0

    walls = []
    for i in range(int(os.environ.get("FEMO_WING_REPS", "3"))):
        t0 = time.perf_counter()
        run(th0 * (1.0 + 0.01 * i))  # new values, same shapes
        walls.append(time.perf_counter() - t0)
        print(f"[wing_bench] steady {walls[-1]:.2f}s", file=sys.stderr,
              flush=True)
    wall = min(walls)

    print(f"[wing_bench] {jax.default_backend()} {nel} cells "
          f"{n_dofs} dofs: first {first:.2f}s steady {wall:.3f}s "
          f"compliance {c:.6e} |g| {np.linalg.norm(g):.3e}",
          file=sys.stderr)
    hs = getattr(getattr(model.fea.states["disp_solid"].pde, "_hostloop",
                         None), "last_stats", {}) or {}
    pc = type(model.fea.states["disp_solid"].pde._pc).__name__
    print(json.dumps({
        "metric": f"wing_fwd_adjoint_{n_dofs}dofs_wall",
        "value": round(wall, 4),
        "unit": "s",
        "n_cells": nel,
        "backend": jax.default_backend(),
        "compile_s": round(first - wall, 1),
        "precond": pc,
        "solver_stats": {k: (round(v, 12) if isinstance(v, float) else v)
                         for k, v in hs.items()},
    }))


if __name__ == "__main__":
    main()
