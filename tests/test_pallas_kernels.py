"""Pallas cell-matvec kernel (assembly/pallas_kernels.py): interpret-mode
equivalence with the jnp sum-form on CPU (the real-TPU path is exercised by
the driver bench; Mosaic is TPU-only)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from femo_alpha_tpu.assembly import pallas_kernels as pk


@pytest.mark.parametrize("nd,nc", [(39, 512), (12, 256), (3, 128)])
def test_kernel_matches_sum_form_interpret(nd, nc):
    if not pk._HAS_PALLAS:
        pytest.skip("pallas unavailable")
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((nd, nd, nc)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((nd, nc)), jnp.float32)
    bc = 128

    y = pl.pallas_call(
        pk._matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((nd, nc), x.dtype),
        grid=(nc // bc,),
        in_specs=[
            pl.BlockSpec((nd, nd, bc), lambda i: (i * 0, i * 0, i)),
            pl.BlockSpec((nd, bc), lambda i: (i * 0, i)),
        ],
        out_specs=pl.BlockSpec((nd, bc), lambda i: (i * 0, i)),
        interpret=True,
    )(A, x)
    y_ref = jnp.sum(A * x[None, :, :], axis=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)


def test_pick_block_cells():
    assert pk.pick_block_cells(39, 4096) in (256, 512, 1024)
    assert pk.pick_block_cells(39, 100) is None  # not 128-blockable
    assert pk.pick_block_cells(3, 20480) is not None
    # huge nd: Ae block alone would blow VMEM
    assert pk.pick_block_cells(2000, 4096) is None


def test_use_pallas_matvec_gates_on_backend_and_dtype():
    A = jnp.ones((12, 12, 256), jnp.float32)
    x = jnp.ones((12, 256), jnp.float32)
    out = pk.use_pallas_matvec(A, x)
    if jax.default_backend() == "tpu":
        assert out is not None
    else:
        assert out is None  # CPU tests must take the jnp path
    # f64 never uses the kernel (Mosaic has no f64)
    assert pk.use_pallas_matvec(A.astype(jnp.float64),
                                x.astype(jnp.float64)) is None


def test_combine_df_interpret_matches_xla_df_and_f64():
    """Fused float-float combine (interpret mode): bit-level agreement with
    the XLA df path in assembly/affine._affine_combine and ~2^-48 accuracy
    vs the exact f64 combine."""
    if not pk._HAS_PALLAS:
        pytest.skip("pallas unavailable")
    from femo_alpha_tpu.solvers.dfloat import (
        DF, df_add, df_from_f64, df_mul, df_to_f64)

    rng = np.random.default_rng(3)
    K, nd, nc = 2, 13, 256
    powers = (1, 3)
    B64 = jnp.asarray(rng.standard_normal((K, nd, nd, nc)) * 1e3)
    th64 = jnp.asarray(rng.uniform(0.1, 0.3, nc))
    B = df_from_f64(B64)
    cs = [df_from_f64(th64 ** p) for p in powers]
    out = None
    for k, c in enumerate(cs):
        cb = DF(c.hi[None, None, :], c.lo[None, None, :])
        term = df_mul(DF(B.hi[k], B.lo[k]), cb)
        out = term if out is None else df_add(out, term)
    ref = df_to_f64(out)

    bc = pk.use_pallas_combine(B.hi, force=True)
    assert bc is not None
    chi = jnp.stack([c.hi for c in cs])[:, None, :]
    clo = jnp.stack([c.lo for c in cs])[:, None, :]
    hi, lo = pk.combine_df_pallas(B.hi, B.lo, chi, clo, bc, interpret=True)
    fused = df_to_f64(DF(hi, lo))

    exact = sum((th64 ** p)[None, None, :] * B64[k]
                for k, p in enumerate(powers))
    scale = float(jnp.max(jnp.abs(exact)))
    assert float(jnp.max(jnp.abs(fused - ref))) / scale < 1e-13
    assert float(jnp.max(jnp.abs(fused - exact))) / scale < 1e-12


def test_use_pallas_combine_gates():
    z = jnp.zeros((2, 13, 13, 256), jnp.float32)
    # CPU backend: gated off unless forced
    if jax.default_backend() != "tpu":
        assert pk.use_pallas_combine(z) is None
    if pk._HAS_PALLAS:
        assert pk.use_pallas_combine(z, force=True) in (128, 256)
        # non-blockable cell count / wrong dtype / wrong rank
        assert pk.use_pallas_combine(
            jnp.zeros((2, 13, 13, 100), jnp.float32), force=True) is None
        assert pk.use_pallas_combine(
            jnp.zeros((2, 13, 13, 256), jnp.float64), force=True) is None
        assert pk.use_pallas_combine(
            jnp.zeros((13, 13, 256), jnp.float32), force=True) is None
