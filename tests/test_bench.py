"""The benchmark workload's manual staged adjoint must match end-to-end AD
and FD (it is the flow the driver times, so its correctness is load-bearing).
"""

import numpy as np
import jax
import jax.numpy as jnp

from femo_alpha_tpu.benchmarks import ShellBench
from femo_alpha_tpu.adjoint import check_totals


def test_bench_adjoint_matches_fd():
    b = ShellBench(nx=8, ny=4, cg_tol=1e-12)

    def obj(p):
        out = b.forward_adjoint(p["thickness"])
        return out["J"], out["grad"]

    th = b.th0
    J, g = obj({"thickness": th})
    # FD check along 2 directions
    rng = np.random.default_rng(0)
    for _ in range(2):
        d = jnp.asarray(rng.standard_normal(th.shape))
        eps = 1e-6
        Jp = float(b.forward_adjoint(th + eps * d)["J"])
        Jm = float(b.forward_adjoint(th - eps * d)["J"])
        fd = (Jp - Jm) / (2 * eps)
        ad = float(jnp.vdot(g, d))
        assert abs(fd - ad) / max(abs(fd), 1e-12) < 1e-4, (fd, ad)


def test_bench_solution_physics():
    b = ShellBench(nx=16, ny=4, cg_tol=1e-11)
    out = b.forward_adjoint(b.th0)
    tip = float(jnp.max(jnp.abs(out["u"])))
    eb = 2.0 * 2.0 * 10.0**4 / (8 * 4.32e8 * (2.0 * 0.2**3 / 12))
    assert abs(tip - eb) / eb < 5e-3, (tip, eb)
    assert int(out["iters_fwd"]) > 0


def test_bench_refined_jacobi_lane_major():
    """ADVICE r1 (medium): mode='refined' + precond='jacobi' + lane_major
    assembled Ae cell-major but routed it through the lane-major matvec —
    crashed at trace time. Must now solve to the f32-refinement floor."""
    b = ShellBench(nx=8, ny=4, mode="refined", precond="jacobi",
                   lane_major=True, affine=True, cg_tol=1e-6,
                   refine_passes=30, inner_iters=4000)
    out = b.forward_adjoint(b.th0)
    assert float(out["res_fwd"]) < 1e-5
    tip = float(jnp.max(jnp.abs(out["u"])))
    eb = 2.0 * 2.0 * 10.0**4 / (8 * 4.32e8 * (2.0 * 0.2**3 / 12))
    assert abs(tip - eb) / eb < 2e-2, (tip, eb)
