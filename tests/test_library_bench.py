"""VERDICT round-1 item 5: the PRODUCT path (RMShellModel.evaluate +
jax.grad) must be within ~1.2x of the hand-staged ShellBench pipeline.
Since the staged custom_vjp rework (adjoint/implicit.py: persistent jitted
fwd/bwd, affine re-assembly, shared MG state) the library path is in fact
FASTER on CPU — the fused program beats host staging."""

import numpy as np
import jax.numpy as jnp

from femo_alpha_tpu.benchmarks import LibraryBench, ShellBench


def test_library_path_within_budget_of_staged():
    nx, ny = 64, 16
    lib = LibraryBench(nx=nx, ny=ny)
    stg = ShellBench(nx=nx, ny=ny)
    out_l = lib.timed_run(repeats=2)
    out_s = stg.timed_run(repeats=2)
    # identical physics
    assert abs(out_l["J"] - out_s["J"]) < 1e-8 * abs(out_s["J"])
    assert abs(out_l["tip"] - out_s["tip"]) < 1e-6 * abs(out_s["tip"])
    assert abs(out_l["grad_norm"] - out_s["grad_norm"]) < (
        1e-6 * out_s["grad_norm"])
    # solve quality on the product path. res_fwd is the TRUE constrained
    # residual re-assembled through the energy gradient (benchmarks.py
    # _rel), whose f64 floor is eps*cond(A) ~ 1e-8 at this size/thickness
    # (the CG recurrence residual reaches the 1e-11 tol); 5e-8 asserts the
    # solve sits at that floor, not above it
    assert out_l["res_fwd"] < 5e-8
    # the perf criterion
    ratio = out_l["wall_s"] / out_s["wall_s"]
    assert ratio < 1.2, (out_l["wall_s"], out_s["wall_s"], ratio)
