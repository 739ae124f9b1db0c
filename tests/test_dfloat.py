"""Float-float arithmetic (solvers/dfloat.py): precision vs f64 references.

Note the conftest enables x64, so f64 here is REAL f64 on CPU — the
reference for the ~2^-48 float-float claims."""

import numpy as np
import jax.numpy as jnp

from femo_alpha_tpu.solvers import dfloat as df


def _rand(n, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(scale * rng.standard_normal(n))


def test_roundtrip():
    # two f32 mantissas carry ~48 bits (< f64's 52): roundtrip is accurate
    # to ~2^-48 relative, not exact
    x = _rand(1000, 0)
    d = df.df_from_f64(x)
    np.testing.assert_allclose(np.asarray(df.df_to_f64(d)), np.asarray(x),
                               rtol=1e-14, atol=0)


def test_add_mul_precision():
    x, y = _rand(4096, 1), _rand(4096, 2)
    dx, dy = df.df_from_f64(x), df.df_from_f64(y)
    s = df.df_to_f64(df.df_add(dx, dy))
    p = df.df_to_f64(df.df_mul(dx, dy))
    # errors are ~2^-48 of the INPUT magnitude (cancellation in x+y can
    # amplify the relative error), so compare with an input-scaled atol
    np.testing.assert_allclose(np.asarray(s), np.asarray(x + y),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(p), np.asarray(x * y),
                               rtol=1e-12, atol=1e-13)


def test_dot_precision_vs_f32():
    n = 200_000
    x, y = _rand(n, 3), _rand(n, 4)
    exact = float(jnp.vdot(x, y))
    approx32 = float(jnp.vdot(x.astype(jnp.float32), y.astype(jnp.float32)))
    got = float(df.df_to_f64(df.df_dot(df.df_from_f64(x), df.df_from_f64(y))))
    scale = float(jnp.vdot(jnp.abs(x), jnp.abs(y)))
    assert abs(got - exact) / scale < 1e-12          # ~2^-48 class
    assert abs(got - exact) < 1e-4 * abs(approx32 - exact) + 1e-12 * scale


def test_axpy_chain_stability():
    # a CG-like recurrence: r <- r - alpha*q repeated; float-float must track
    # the f64 recurrence to ~1e-12 relative after many steps
    n = 10_000
    r64 = _rand(n, 5)
    q64 = _rand(n, 6)
    r = df.df_from_f64(r64)
    q = df.df_from_f64(q64)
    for k in range(50):
        alpha = df.DF(jnp.float32(0.01 * (k + 1)), jnp.float32(0.0))
        a64 = float(alpha.hi)
        r64 = r64 - a64 * q64
        r = df.df_sub(r, df.df_scale(q, alpha))
    err = float(jnp.max(jnp.abs(df.df_to_f64(r) - r64)))
    assert err < 1e-11 * float(jnp.max(jnp.abs(r64)) + 1.0)


def test_jit_preserves_error_free_transforms():
    """Under jit, LLVM's FMA contraction (fmul fused into a following fadd
    inside fused kernels, even across hlo optimization barriers) used to
    give every use-site of a raw product a DIFFERENT f32 value, silently
    degrading jit df_dot to ~1e-8 relative while eager stayed ~1e-14.
    Guard the fix (_seal + bit-mask _split) on every backend."""
    import jax

    for n in (64, 63_000):
        x, y = _rand(n, 7), _rand(n, 8)
        xdf, ydf = df.df_from_f64(x), df.df_from_f64(y)
        ref = float(jnp.vdot(x, y))
        got = float(df.df_to_f64(jax.jit(df.df_dot)(xdf, ydf)))
        scale = float(jnp.vdot(jnp.abs(x), jnp.abs(y)))
        assert abs(got - ref) / scale < 1e-12, (n, got, ref)


def test_df_cell_matvec_matches_f64():
    import jax

    from femo_alpha_tpu.assembly.assemble import cell_matvec_T

    nd, nc = 39, 512
    rng = np.random.default_rng(2)
    Ae = jnp.asarray(rng.standard_normal((nd, nd, nc)))
    xc = jnp.asarray(rng.standard_normal((nd, nc)))
    ref = np.asarray(cell_matvec_T(Ae, xc))
    got = np.asarray(df.df_to_f64(jax.jit(df.df_cell_matvec_T)(
        df.df_from_f64(Ae), df.df_from_f64(xc))))
    assert np.linalg.norm(got - ref) <= 1e-12 * np.linalg.norm(ref)


def test_cg_hostloop_df_matches_f64():
    """Float-float CG (df vector state, f64 operator) must reach the same
    solution as the f64 host-loop CG on an SPD system."""
    from femo_alpha_tpu.solvers.krylov import (
        cg_solve_hostloop, cg_solve_hostloop_df)

    n = 300
    rng = np.random.default_rng(3)
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    lam = np.linspace(1.0, 1e4, n)  # spd, cond 1e4
    A = jnp.asarray((Q * lam) @ Q.T)
    b = jnp.asarray(rng.standard_normal(n))
    mv = lambda v: A @ v  # noqa: E731
    x64, info64 = cg_solve_hostloop(mv, b, tol=1e-11, maxiter=3000)
    xdf, infodf = cg_solve_hostloop_df(mv, b, tol=1e-11, maxiter=3000)
    assert bool(infodf["converged"]), float(infodf["resnorm"])
    # both at the same residual target -> same solution to solver tol
    ref = np.linalg.solve(np.asarray(A), np.asarray(b))
    assert np.linalg.norm(np.asarray(x64) - ref) <= 1e-9 * np.linalg.norm(ref)
    assert np.linalg.norm(np.asarray(xdf) - ref) <= 1e-9 * np.linalg.norm(ref)
