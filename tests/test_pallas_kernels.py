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
