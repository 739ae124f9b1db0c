"""Pallas TPU kernels for the hot per-cell contractions.

The workhorse of every preconditioned CG iteration is the lane-major
per-cell matvec  y[i,c] = sum_j Ae_T[i,j,c] x[j,c]  (assemble.cell_matvec_T)
— it reads the whole element-matrix array (the dominant HBM stream of the
solve phase; 24MB f32 at 63k dofs). XLA's fused broadcast-multiply-reduce
runs ~9x off the bandwidth limit on TPU (measured 268us vs ~30us
speed-of-light at 63k dofs); this kernel streams Ae_T through VMEM in
cell-blocks and does the j-reduction on the VPU with everything on-chip,
approaching the HBM-bandwidth bound.

Replaces (performance-wise) the PETSc MatMult the reference leans on for
every Krylov iteration (reference: femo_alpha/fea/utils_dolfinx.py:275-306).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/GPU-only in some builds; import lazily-guarded
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# VMEM working-set cap for choosing the cell-block size: Ae block is
# (nd, nd, BC) * 4B, double-buffered by the pallas pipeline.
_VMEM_BYTES = 8 * 1024 * 1024


def _matvec_kernel(a_ref, x_ref, o_ref):
    # a: (nd, nd, BC), x: (nd, BC) -> o: (nd, BC); reduce over axis 1
    o_ref[:] = jnp.sum(a_ref[:] * x_ref[:][None, :, :], axis=1)


@functools.partial(jax.jit, static_argnames=("block_cells",))
def cell_matvec_T_pallas(Ae_T, xc_T, block_cells):
    """Lane-major per-cell matvec as a Pallas kernel.

    Ae_T: (nd, nd, nc), xc_T: (nd, nc) -> (nd, nc). `nc` must be divisible
    by `block_cells` (choose via `pick_block_cells`)."""
    nd, _, nc = Ae_T.shape
    grid = (nc // block_cells,)
    return pl.pallas_call(
        _matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((nd, nc), xc_T.dtype),
        grid=grid,
        # i*0 (not literal 0): under jax_enable_x64, int literals trace as
        # i64 while program ids are i32 — the mixed-type index_map fails
        # Mosaic legalization ("func.return (i64, i64, i32)")
        in_specs=[
            pl.BlockSpec((nd, nd, block_cells), lambda i: (i * 0, i * 0, i)),
            pl.BlockSpec((nd, block_cells), lambda i: (i * 0, i)),
        ],
        out_specs=pl.BlockSpec((nd, block_cells), lambda i: (i * 0, i)),
    )(Ae_T, xc_T)


def pick_block_cells(nd, nc, itemsize=4):
    """Largest 128-multiple block with a double-buffered Ae block under the
    VMEM cap; None if `nc` cannot be blocked (not a 128-multiple)."""
    if nc % 128 != 0:
        return None
    bc = 128
    while (bc * 2 <= 2048 and nc % (bc * 2) == 0
           and nd * nd * (bc * 2) * itemsize * 2 <= _VMEM_BYTES):
        bc *= 2
    if nd * nd * bc * itemsize * 2 > _VMEM_BYTES:
        return None
    return bc


def use_pallas_matvec(Ae_T, xc_T):
    """Returns the chosen cell block size (int) when the Pallas path
    applies — TPU backend, f32/bf16 data, blockable cell count — else
    None. Callers use the value both as the gate and as `block_cells`.
    (f64 is XLA-emulated and unsupported in Mosaic.)"""
    if not _HAS_PALLAS:
        return None
    if jax.default_backend() != "tpu":
        return None
    if Ae_T.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    if xc_T.dtype != Ae_T.dtype:
        return None
    nd, nd2, nc = Ae_T.shape
    if nd != nd2:
        return None
    return pick_block_cells(nd, nc, Ae_T.dtype.itemsize)
