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


def _make_combine_df_kernel(use_barriers):
    """out = sum_k DF(B[k]) * DF(c[k]) over a cell block, float-float.

    b*: (K, nd, nd, BC); c*: (K, 1, BC) per-cell coefficient pairs.
    One pass through VMEM: the ~10 f32 temporaries per df op live in
    registers/VMEM instead of HBM (the XLA lowering materializes them —
    measured 8.6 ms vs ~2.7 ms for the 63k combine).

    Barrier handling: dfloat's error-free transforms need optimization
    barriers under XLA CPU (the simplifier folds `(a+b)-a -> b`;
    measured 3e-8 rel in interpret mode without them), but Mosaic has no
    optimization_barrier lowering — and does not run that simplifier, so
    the plain structure is preserved on TPU (verified bit-identical to
    the barrier-protected XLA df path on a v5e). interpret=True uses
    real barriers; the TPU body uses identity. The mantissa-mask _split
    (integer bitcast) is fold-proof either way."""
    if use_barriers:
        ob = lambda x: jax.lax.optimization_barrier(x)  # noqa: E731
    else:
        ob = lambda x: x  # noqa: E731

    def two_sum(a, b):
        s = ob(a + b)
        bb = ob(s - a)
        err = (a - ob(s - bb)) + (b - bb)
        return s, err

    def quick_two_sum(a, b):
        s = ob(a + b)
        return s, b - ob(s - a)

    def split(a):
        bits = jax.lax.bitcast_convert_type(a, jnp.int32)
        hi = jax.lax.bitcast_convert_type(
            bits & jnp.int32(-4096), jnp.float32)
        return hi, a - hi

    def two_prod(a, b):
        # dfloat._seal semantics: `+0.0` pins fl(a*b) against LLVM fma
        # contraction (an hlo barrier alone does not — dfloat docstring)
        p = (a * b) + ob(jnp.zeros((), jnp.float32))
        ah, al = split(a)
        bh, bl = split(b)
        err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
        return p, err

    def kernel(bhi_ref, blo_ref, chi_ref, clo_ref, ohi_ref, olo_ref):
        K = bhi_ref.shape[0]
        acc_hi = acc_lo = None
        for k in range(K):
            xh, xl = bhi_ref[k], blo_ref[k]
            ch = chi_ref[k][None, :, :]
            cl = clo_ref[k][None, :, :]
            # df_mul(B_k, c_k)
            p, e = two_prod(xh, ch)
            e = e + xh * cl + xl * ch
            hi, lo = quick_two_sum(p, e)
            if acc_hi is None:
                acc_hi, acc_lo = hi, lo
            else:
                # df_add(acc, term)
                s, e2 = two_sum(acc_hi, hi)
                e2 = e2 + acc_lo + lo
                acc_hi, acc_lo = quick_two_sum(s, e2)
        ohi_ref[:] = acc_hi
        olo_ref[:] = acc_lo

    return kernel


@functools.partial(jax.jit, static_argnames=("block_cells", "interpret"))
def combine_df_pallas(Bhi, Blo, chi, clo, block_cells, interpret=False):
    """Fused float-float affine combine: returns the (hi, lo) PAIR of
    sum_k theta^p_k * B[k] in lane-major (nd, nd, nc) layout.

    Bhi/Blo: (K, nd, nd, nc) f32 basis pair; chi/clo: (K, 1, nc) f32
    per-cell coefficient pair (df_from_f64(theta**p)). The f64 emission
    stays outside (Mosaic has no f64): callers run df_to_f64 on the pair,
    one fused elementwise XLA pass."""
    K, nd, _, nc = Bhi.shape
    grid = (nc // block_cells,)
    z = lambda i: i * 0  # noqa: E731 — i32 zero (see matvec specs)
    pair = pl.pallas_call(
        _make_combine_df_kernel(use_barriers=interpret),
        out_shape=(jax.ShapeDtypeStruct((nd, nd, nc), jnp.float32),
                   jax.ShapeDtypeStruct((nd, nd, nc), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, nd, nd, block_cells),
                         lambda i: (z(i), z(i), z(i), i)),
            pl.BlockSpec((K, nd, nd, block_cells),
                         lambda i: (z(i), z(i), z(i), i)),
            pl.BlockSpec((K, 1, block_cells), lambda i: (z(i), z(i), i)),
            pl.BlockSpec((K, 1, block_cells), lambda i: (z(i), z(i), i)),
        ],
        out_specs=(
            pl.BlockSpec((nd, nd, block_cells), lambda i: (z(i), z(i), i)),
            pl.BlockSpec((nd, nd, block_cells), lambda i: (z(i), z(i), i)),
        ),
        interpret=interpret,
    )(Bhi, Blo, chi, clo)
    return pair


def use_pallas_combine(Bhi, force=False):
    """Cell-block size when the fused df-combine applies (TPU backend,
    f32 pair, blockable cell count and VMEM fit), else None. `force=True`
    skips the backend check (interpret-mode tests)."""
    if not _HAS_PALLAS:
        return None
    if not force and jax.default_backend() != "tpu":
        return None
    if Bhi.dtype != jnp.float32 or Bhi.ndim != 4:
        return None
    K, nd, nd2, nc = Bhi.shape
    if nd != nd2 or nc % 128 != 0:
        return None
    # working set per block: 2K input + 2 output (nd,nd,BC) f32 arrays,
    # double-buffered by the pipeline; the TPU scoped-vmem limit is 16 MB
    # (measured: bc=256 at K=2, nd=39 allocates 18.3 MB and is rejected)
    cap = 14 * 1024 * 1024
    bc = 128
    while (bc * 2 <= 1024 and nc % (bc * 2) == 0
           and (2 * K + 2) * nd * nd * (bc * 2) * 4 * 2 <= cap):
        bc *= 2
    if (2 * K + 2) * nd * nd * bc * 4 * 2 > cap:
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
