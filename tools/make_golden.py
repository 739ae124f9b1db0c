"""Produce the committed host-f64 direct golden solution for the bench
workload at a given size (round-4 verdict item 2: an independent quality
oracle at the 988k scale point, where a live SuperLU cross-check is
infeasible inside the driver budget).

Solves the north-star system (structured cantilever plate, nominal design
th=0.2, E=4.32e8, nu=0, uniform pressure f_z=2.0 — exactly the state
bench.py measures quality at) with scipy SuperLU in host f64 plus TWO
iterative-refinement steps, reports its backward errors, and writes
tests/data/golden_u_{nx}x{ny}_{bc}.npz. bench.py's child mode compares the
device solution against this file (`nodal_err_vs_direct`).

Reference parity: this is the MUMPS factorization role
(/root/reference/femo_alpha/fea/utils_dolfinx.py:495-531) executed once,
host-side, as an oracle rather than a production solver.

Usage: FEMO_PLATFORM=cpu python tools/make_golden.py [nx ny] (default 512 128)
"""

import json
import os
import sys
import time

os.environ.setdefault("FEMO_PLATFORM", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    bc = os.environ.get("FEMO_BENCH_BC", "strong")

    from femo_alpha_tpu.benchmarks import LibraryBench
    from femo_alpha_tpu.utils.quality import backward_errors, sparse_operator

    t0 = time.time()
    b = LibraryBench(nx=nx, ny=ny, penalty=(bc == "penalty"))
    op = b.model.fea.states["disp_solid"].pde
    params = {"thickness": b.th0, "E": b.E, "nu": b.nu,
              "uhat": jnp.zeros_like(b.f), "F_solid": b.f}
    print(f"[golden] model build {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    B, rhs = sparse_operator(op, params)
    print(f"[golden] sparse assembly {time.time() - t0:.1f}s "
          f"(n={B.shape[0]}, nnz={B.nnz})", file=sys.stderr)

    import scipy.sparse.linalg as spla

    t0 = time.time()
    lu = spla.splu(B)
    print(f"[golden] splu factorization {time.time() - t0:.1f}s",
          file=sys.stderr)
    u = lu.solve(rhs)
    for _ in range(2):
        u = u + lu.solve(rhs - B @ u)
    eta, omega, rel = backward_errors(B, rhs, u)
    meta = {
        "nx": nx, "ny": ny, "bc": bc, "n_dofs": int(B.shape[0]),
        "eta": eta, "omega": omega, "rel_res": rel,
        "u_norm": float(np.linalg.norm(u)),
        "u_max": float(np.max(np.abs(u))),
        "design": "th=0.2 E=4.32e8 nu=0 fz=2.0 pressure (bench nominal)",
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data",
        f"golden_u_{nx}x{ny}_{bc}.npz")
    np.savez_compressed(out, u=u.astype(np.float64),
                        meta=json.dumps(meta))
    print(json.dumps(meta), flush=True)
    print(f"[golden] wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
