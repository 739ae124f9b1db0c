"""Million-dof RM shell forward + adjoint on a single TPU chip.

The reference's largest shipped fixture is an 80x400 plate (~195k mixed
dofs, plate_sim.py:555-563) and every solve goes through MUMPS on the host.
Here the same cantilever-plate workload at 512x128 (988,806 mixed dofs)
runs entirely on one TPU chip: affine re-assembly (2 AXPYs), f64 CG
preconditioned by an f32 geometric V-cycle (5 levels), and the exact
adjoint gradient of the compliance w.r.t. the per-cell thickness field.

Run: python examples/advanced_examples/large_scale/ex_million_dof_shell.py
(first compile of the f64 programs at this size takes tens of minutes on
the experimental TPU platform; subsequent runs hit the persistent cache).
"""

import time

import jax
import jax.numpy as jnp

import femo_alpha_tpu  # noqa: F401  (platform/x64/matmul-precision config)
from femo_alpha_tpu.benchmarks import ShellBench
from femo_alpha_tpu.utils.timing import sync

NX, NY = 512, 128


def main():
    t0 = time.time()
    bench = ShellBench(nx=NX, ny=NY)
    print(f"built {bench.n_dofs} dofs in {time.time() - t0:.1f}s "
          f"({jax.default_backend()})")

    t0 = time.time()
    out = bench.forward_adjoint(bench.th0)
    sync(out["grad"])
    print(f"first forward+adjoint (incl. compile): {time.time() - t0:.1f}s")

    t0 = time.time()
    out = bench.forward_adjoint(bench.th0)
    sync(out["grad"])
    print(f"steady forward+adjoint: {time.time() - t0:.3f}s")
    print(f"iters fwd/adj {int(out['iters_fwd'])}/{int(out['iters_adj'])}  "
          f"rel_res {float(out['res_fwd']):.2e}/{float(out['res_adj']):.2e}")
    print(f"J = {float(out['J']):.9e}  "
          f"|dJ/dth| = {float(jnp.linalg.norm(out['grad'])):.6e}  "
          f"tip = {float(jnp.max(jnp.abs(out['u']))):.6e}")


if __name__ == "__main__":
    main()
