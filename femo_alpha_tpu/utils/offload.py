"""Setup-time compute offload: run shape-setup programs on the host CPU
backend when the default backend is a (tunneled) accelerator.

Motivation (measured 2026-08-18 on the axon TPU tunnel): XLA compile time
on the tunneled backend is roughly proportional to HLO op count at
~0.1-1 s/op with no usable cross-process compile cache, so a single
element-matrix probe assembly (jacfwd of the shell energy kernel, ~1800
jaxpr eqns) costs 150-470 s to compile — per process, per shape. The same
program compiles on the local CPU backend in seconds and runs in f64
natively. Setup-time artifacts (affine design bases, preconditioner
factorizations) are built once per model instance and are small enough to
ship over the tunnel (~30 MB/s host->device), so building them on CPU and
transferring wins by an order of magnitude. Solve-time programs stay on
the accelerator (fused while_loop Krylov + V-cycle: few unique ops, many
iterations).

Opt out with FEMO_SETUP_ON_CPU=0 (e.g. on a directly-attached TPU where
compiles are fast and host compute is weak).
"""

from __future__ import annotations

import os

import jax


def setup_device():
    """The CPU device setup programs should run on, or None to run on the
    default backend (CPU default backend, opt-out, or no CPU backend)."""
    if os.environ.get("FEMO_SETUP_ON_CPU", "1") == "0":
        return None
    try:
        if jax.default_backend() == "cpu":
            return None
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def run_setup(fn, *args, **kwargs):
    """Run `fn(*args, **kwargs)` (a jittable computation) on the setup
    device and return its outputs on the DEFAULT device.

    Inputs are device_put to the setup device first so the computation
    never mixes committed accelerator arrays into a CPU-pinned trace;
    outputs are moved back in one transfer per leaf."""
    dev = setup_device()

    def _to(tree, device):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, device) if hasattr(a, "dtype")
            else a, tree)

    # ensure_compile_time_eval: setup computations must produce REAL
    # arrays even when triggered under an ambient trace (e.g. an
    # eval_shape warm or a user jit around model.evaluate) — staged into
    # the trace they would leak as dead tracers out of the host-side
    # caches that hold them.
    with jax.ensure_compile_time_eval():
        if dev is None:
            return fn(*args, **kwargs)
        with jax.default_device(dev):
            out = fn(*_to(args, dev), **_to(kwargs, dev))
        default = jax.devices()[0]
        return _to(out, default)
