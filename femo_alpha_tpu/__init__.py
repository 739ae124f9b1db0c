"""femo_alpha_tpu — a TPU-native differentiable-FEM + adjoint-optimization framework.

Re-implements the capability surface of LSDOlab/femo_alpha (reference:
/root/reference, see SURVEY.md) with a TPU-first architecture:

- element kernels are pure JAX per-cell functions; residuals/Jacobians/partials
  come from `jax.grad`/`jax.jacfwd` (replacing UFL `derivative` + FFCx codegen)
- assembly is gather -> batched-compute -> segment_sum scatter on device
  (replacing dolfinx C++ assembly + PETSc scatters)
- solves are matrix-free preconditioned Krylov or batched dense direct on
  device (replacing PETSc KSP + MUMPS LU)
- adjoints come from `jax.custom_vjp` implementing the implicit-function
  theorem, and `lax.scan` + `jax.checkpoint` for transient problems
  (replacing csdl CustomImplicitOperation machinery)

float64 is enabled by default (set FEMO_X64=0 to disable) because the
reference stack is float64 end-to-end and the correctness anchors require
~1e-8 agreement. Hot paths may downcast internally where safe.
"""

import os as _os

import jax as _jax

# Select the platform explicitly when asked (the JAX_PLATFORMS env var can be
# shadowed by platform plugins; the config route always wins). Tests set
# FEMO_PLATFORM=cpu to run on a virtual multi-device CPU mesh.
_platform = _os.environ.get("FEMO_PLATFORM")
if _platform:
    _jax.config.update("jax_platforms", _platform)

_X64 = _os.environ.get("FEMO_X64", "1") != "0"
if _X64:
    _jax.config.update("jax_enable_x64", True)

# TPU MXU matmuls default to bf16 multiplication passes for f32 operands —
# 8 mantissa bits. FEM operators span ~8 orders of magnitude (membrane Eh vs
# bending Eh^3 terms), so bf16 contraction noise makes smoothers/coarse
# solves DIVERGE (measured: a V-cycle built this way amplifies residuals
# 5e4x). 'highest' lowers f32 matmuls to multi-pass bf16 (6-pass) which is
# genuinely f32-accurate at ~3x the MXU cost — mandatory for FEM.
# Override with FEMO_MATMUL_PRECISION if a model can tolerate less.
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("FEMO_MATMUL_PRECISION", "highest"),
)

# Persistent compilation cache: ON by default (FEMO_COMPILE_CACHE=0 to
# disable). On the tunneled TPU backend every program remote-compiles at
# ~0.1-1 s/HLO-op per process; the cache turns that into a one-time cost
# (measured 2026-08-20: 1.76 s -> 0.18 s across processes for a 40-op
# program). Hazard handled: XLA:CPU entries bake host machine features
# into AOT artifacts, and this VM can migrate between physical hosts —
# a stale cross-host entry once produced silently wrong numerics (an
# exact affine decomposition verifying at 1e-7 instead of 1e-15). The
# cache directory is therefore fingerprinted by (jax version, CPU model
# + feature flags): a host migration gets a cold cache, never a stale
# one. Both backends of one process share the fingerprinted dir — keys
# already separate platforms.
if _os.environ.get("FEMO_COMPILE_CACHE", "1") != "0":
    _cache_root = _os.environ.get(
        "FEMO_COMPILE_CACHE_DIR", "/root/.cache/femo_xla")
    try:
        import hashlib as _hashlib

        def _machine_fingerprint():
            # microcode + bugs lines matter as much as the flags: LLVM's
            # CPU autodetect flips tuning features (prefer-no-scatter/
            # gather — the GDS-mitigation heuristics) based on microcode,
            # and a cross-host AOT entry whose target features disagree
            # with the executing host produced heap corruption and
            # wrong numerics (measured 2026-08-21: a cached eager op
            # returned 1.3e+223 where the fresh compile was exact)
            feats = [_jax.__version__]
            try:
                with open("/proc/cpuinfo") as _f:
                    for _line in _f:
                        if _line.startswith(("model name", "flags",
                                             "microcode", "bugs",
                                             "cpu family", "model\t",
                                             "stepping")):
                            feats.append(_line.strip())
                        if _line.strip() == "" and len(feats) > 1:
                            break  # first CPU block only
            except OSError:
                pass
            return _hashlib.sha1("|".join(feats).encode()).hexdigest()[:16]

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(_cache_root, _machine_fingerprint()),
        )
        # persist EVERYTHING, including sub-0.5s tiny programs: the eager
        # glue of one forward_adjoint compiles ~280 distinct tiny ops
        # (broadcast/convert/multiply/...), each a ~0.2-0.5 s round trip
        # on the tunneled backend — below the default 0.5 s persistence
        # threshold, so every fresh process re-paid ~110 s of compiles
        # that a disk hit serves in ~20 ms (measured 2026-08-21, 63k
        # headline compile_s 120 s with all big programs already cached)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these options
        pass

__version__ = "0.1.0"

from . import config  # noqa: E402,F401
