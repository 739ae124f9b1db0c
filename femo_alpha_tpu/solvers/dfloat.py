"""Float-float ("double-single") arithmetic: ~2^-48 precision from f32 pairs.

XLA emulates float64 on TPU in software (integer-based), which makes every
f64 vector op in the outer CG ~100x slower than its f32 counterpart (a
63k-dof f64 vdot costs ~1 ms on a v5e — more than the preconditioned
matvec). A float-float representation (value = hi + lo, |lo| <= ulp(hi)/2)
runs entirely on native VPU f32 ops with ~48-bit effective mantissa —
enough for 1e-9-relative-residual CG on FEM systems (the reference's MUMPS
solves are f64; the accuracy-critical quantity here is the RESIDUAL
RECURRENCE, which float-float tracks to ~1e-14 relative).

Algorithms: Knuth two-sum, Dekker split/two-prod (f32 split constant
2^12+1 = 4097), Bailey double-single add/mul. All ops are elementwise over
arrays and jit/vmap-safe.

Status: building block + tests; wiring into the bench CG is follow-up work
(see COVERAGE.md "Performance state").
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class DF(NamedTuple):
    """value ≈ hi + lo with non-overlapping mantissas (both f32 arrays)."""

    hi: jnp.ndarray
    lo: jnp.ndarray


_SPLIT = jnp.float32(4097.0)  # 2^12 + 1 (f32 has 24 mantissa bits)


def _ob(x):
    """Optimization barrier: under jit, XLA's algebraic simplifier folds
    error-free transforms like `(a + b) - a -> b` (and the CPU backend may
    evaluate f32 chains with excess precision), which silently zeroes the
    compensation terms — measured: jit df_dot degraded from 2e-14 to 4e-9
    relative without barriers. The barrier pins the exact f32 rounding of
    each intermediate."""
    import jax

    return jax.lax.optimization_barrier(x)


def _two_sum(a, b):
    s = _ob(a + b)
    bb = _ob(s - a)
    err = (a - _ob(s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    # requires |a| >= |b|
    s = _ob(a + b)
    err = b - _ob(s - a)
    return s, err


def _split(a):
    """Exact 12+12-bit significand split via mantissa masking.

    The classic Veltkamp split (c = 4097*a; hi = c - (c - a)) is broken by
    FMA contraction: XLA's CPU/LLVM emitter fuses the fmul into the
    following fsub inside fused kernels EVEN ACROSS hlo optimization
    barriers (measured: hi = fma(4097, a, -(c-a)) — a different value),
    which corrupts every downstream two_prod. Integer ops can't contract:
    mask off the low 12 mantissa bits (round-to-zero), so ah has <= 12
    significand bits, al = a - ah is exact (Sterbenz) with <= 12 bits, and
    all cross products are exact in f32."""
    import jax

    bits = jax.lax.bitcast_convert_type(a, jnp.int32)
    hi = jax.lax.bitcast_convert_type(
        bits & jnp.int32(-4096), jnp.float32)
    return hi, a - hi


def _seal(x):
    """Materialize a product's rounded value so every downstream use is the
    SAME f32 number. LLVM contracts fmul+fadd to fma inside fused kernels
    (even across hlo optimization barriers), so a raw product feeding
    two_sum gets a DIFFERENT value at each use site — measured 1.2e-8
    relative error on a 64-term jit df_dot vs 6e-15 eager. `x + 0.0` fixes
    it: the hlo barrier keeps the algebraic simplifier from folding the
    add; at LLVM level fadd(x, +0.0) is not foldable without nsz, and if
    it contracts to fma(a, b, 0.0) the result still equals fl(a*b)."""
    return x + _ob(jnp.zeros((), jnp.float32))


def _two_prod(a, b):
    p = _seal(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def df_from_f64(x):
    """f64 array -> DF (hi = f32 round, lo = f32 of the remainder)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return DF(hi, lo)


def df_to_f64(x: DF):
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def df_zeros_like(a):
    z = jnp.zeros_like(a, dtype=jnp.float32)
    return DF(z, jnp.zeros_like(z))


def df_from_f32(hi):
    return DF(hi, jnp.zeros_like(hi))


def df_add(x: DF, y: DF) -> DF:
    s, e = _two_sum(x.hi, y.hi)
    e = e + x.lo + y.lo
    hi, lo = _quick_two_sum(s, e)
    return DF(hi, lo)


def df_neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_mul(x: DF, y: DF) -> DF:
    p, e = _two_prod(x.hi, y.hi)
    e = e + x.hi * y.lo + x.lo * y.hi
    hi, lo = _quick_two_sum(p, e)
    return DF(hi, lo)


def df_scale(x: DF, s) -> DF:
    """x * s with s a DF scalar (or f32 scalar broadcast)."""
    if not isinstance(s, DF):
        s = DF(jnp.float32(s), jnp.float32(0.0))
    return df_mul(x, DF(jnp.broadcast_to(s.hi, x.hi.shape),
                        jnp.broadcast_to(s.lo, x.hi.shape)))


def df_axpy(alpha, x: DF, y: DF) -> DF:
    """alpha*x + y (alpha a DF scalar)."""
    return df_add(df_scale(x, alpha), y)


def df_dot(x: DF, y: DF) -> DF:
    """Scalar product with compensated accumulation.

    Elementwise products in DF, then a blocked pairwise-style reduction:
    sum the hi/err streams with two-sum compensation. Error O(n * 2^-48)
    relative — ~1e-9 needs only ~2^-30."""
    p, e = _two_prod(x.hi, y.hi)
    e = e + x.hi * y.lo + x.lo * y.hi
    # compensated (Neumaier) sum over the pair stream in f32 is not enough
    # for large n; binary-tree fold with the rounding errors drained into
    # the lo stream (shared with df_cell_matvec_T — ONE copy of the
    # numerically delicate reduction, incl. the magnitude-agnostic final
    # _two_sum renormalization for the heavy-cancellation case)
    h, l2 = _tree_fold_sum(p.ravel(), e.ravel(), 0)
    return DF(h, l2)


def df_norm2(x: DF) -> DF:
    return df_dot(x, x)


def _tree_fold_sum(hi, lo, axis):
    """Compensated binary-tree reduction of a (hi, lo) pair stream along
    `axis`: two-sum folds on the hi words, rounding errors drained into the
    lo stream. Returns (hi, lo) with the axis removed."""
    hi = jnp.moveaxis(hi, axis, 0)
    lo = jnp.moveaxis(lo, axis, 0)
    n = hi.shape[0]
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = [(0, m - n)] + [(0, 0)] * (hi.ndim - 1)
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    while hi.shape[0] > 1:
        h = hi.shape[0] // 2
        s, err = _two_sum(hi[:h], hi[h:])
        lo = lo[:h] + lo[h:] + err
        hi = s
    h, l2 = _two_sum(hi[0], lo[0])
    return h, l2


def df_cell_matvec_T(Ae: DF, xc: DF) -> DF:
    """Lane-major per-cell matvec in float-float: Ae (nd, nd, nc) pair,
    xc (nd, nc) pair -> (nd, nc) pair.

    y[i, c] = sum_j Ae[i, j, c] * xc[j, c] with Dekker two-prod products and
    a compensated tree reduction over j — the float-float twin of
    assembly.assemble.cell_matvec_T. NOTE: a DF pair moves the same 8
    bytes/entry as f64, so on a bandwidth-bound matvec this can only win
    whatever margin the f64 software ARITHMETIC adds on top of the Ae
    streaming cost (see tools/df_microbench.py for the measurement)."""
    p, e = _two_prod(Ae.hi, xc.hi[None, :, :])
    e = e + Ae.hi * xc.lo[None, :, :] + Ae.lo * xc.hi[None, :, :]
    h, l2 = _tree_fold_sum(p, e, axis=1)
    return DF(h, l2)
