"""Design-affine element-operator decomposition.

For forms whose element matrices are a POLYNOMIAL in a per-cell (DG0) design
field, e.g. the RM shell stiffness with element-wise thickness
(linear_shell_model.py:136-157: membrane A ∝ h, shear A_s ∝ h, bending
D ∝ h^3, drilling alpha = E h^3 — so Ae(h) = h*M1 + h^3*M3 exactly for the
MID reference plane; BOT adds the h^2 coupling term B),

    Ae(theta)[c] = sum_k theta_c**powers[k] * M_k[c],

the basis matrices M_k depend only on geometry/material and are extracted
ONCE by assembling at len(powers) probe values of theta and solving the tiny
Vandermonde system. After that, re-assembly for a new design is two (or
three) elementwise AXPYs over the element-matrix array — no jacfwd, no
quadrature — which turns the per-optimizer-iteration "assemble" stage from
the dominant cost into noise. The reference cannot do this: dolfinx
re-runs the FFCx kernels every iteration (state_operation.py:260-296).

This is a TPU-first algorithmic restructuring, not an approximation: the
decomposition is exact (verified against direct assembly in
tests/test_affine.py), and all dtypes/solves downstream are unchanged.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .assemble import element_matrices
from ..utils.offload import run_setup


def _jit_nofold(fn):
    """jit `fn` with XLA's constant_folding pass disabled, falling back to
    plain jit where compiler_options is unsupported."""
    jitted = jax.jit(fn)

    def call(*args):
        try:
            return jitted.lower(*args).compile(
                compiler_options={
                    "xla_disable_hlo_passes": "constant_folding"}
            )(*args)
        except Exception:
            return jitted(*args)

    return call


def _affine_combine(B, theta, powers, layout):
    """Ae(theta) = sum_k theta^p_k * B[k] — plain-array or float-float
    (DF) basis; DF runs the elementwise pass in native-f32 float-float
    arithmetic and emits f64 (see AffineDesignOperator storage='df')."""
    from ..solvers.dfloat import DF

    powers = tuple(int(p) for p in powers)
    if isinstance(B, DF):
        from ..solvers.dfloat import df_add, df_from_f64, df_mul, df_to_f64

        th64 = jnp.asarray(theta).astype(jnp.float64)
        cs = [df_from_f64(th64 ** p) for p in powers]
        if layout == "lane":
            # fused Pallas kernel when applicable: one VMEM pass instead
            # of XLA materializing the ~10 df-op temporaries in HBM
            # (measured at 63k dofs: 8.6 ms -> ~1.5 ms per combine)
            from .pallas_kernels import combine_df_pallas, use_pallas_combine

            bc = use_pallas_combine(B.hi)
            if bc is not None:
                chi = jnp.stack([c.hi for c in cs])[:, None, :]
                clo = jnp.stack([c.lo for c in cs])[:, None, :]
                hi, lo = combine_df_pallas(B.hi, B.lo, chi, clo, bc)
                return df_to_f64(DF(hi, lo))
        out = None
        for k, c in enumerate(cs):
            if layout == "lane":
                cb = DF(c.hi[None, None, :], c.lo[None, None, :])
            else:
                cb = DF(c.hi[:, None, None], c.lo[:, None, None])
            term = df_mul(DF(B.hi[k], B.lo[k]), cb)
            out = term if out is None else df_add(out, term)
        return df_to_f64(out)
    th = jnp.asarray(theta).astype(B.dtype)
    # explicit unrolled sum, NOT an einsum/dot_general: contracting the
    # K axis via dot_general makes XLA's f64-on-TPU emulation materialize
    # multi-GB padded pair-of-f32 temporaries (OOM at 1M dofs); K is 2-3,
    # so the elementwise form fuses into one pass
    if layout == "lane":
        out = (th ** powers[0])[None, None, :] * B[0]
        for k in range(1, len(powers)):
            out = out + (th ** powers[k])[None, None, :] * B[k]
        return out
    out = (th ** powers[0])[:, None, None] * B[0]
    for k in range(1, len(powers)):
        out = out + (th ** powers[k])[:, None, None] * B[k]
    return out


class AffineDesignOperator:
    """Element matrices affine in powers of a scalar per-cell design field.

    Parameters
    ----------
    form : FemForm with the design field among its params
    u0 : linearization state (zeros for linear problems)
    params_of : callable theta -> full params dict (theta under `key`)
    key : name of the design field in the params dict
    powers : exponents of the polynomial dependence, e.g. (1, 3) for the
        MID-plane RM shell, (1, 2, 3) for BOT
    probe_scale : magnitude of the probe values (condition the Vandermonde
        near the expected design range)
    chunk : cell chunk for the probe assemblies
    dtype : dtype of the stored basis (None = form/default dtype)
    layout : 'cells' stores the basis as (K, nc, nd, nd); 'lane' stores it
        TRANSPOSED (K, nd, nd, nc) — pad-free on TPU (see
        assembly.cell_matvec_T) — and `element_matrices` then returns
        lane-major (nd, nd, nc) arrays for make_matvec_T.
    """

    def __init__(self, form, u0, params_of, key="thickness", powers=(1, 3),
                 probe_scale=1.0, chunk=8192, dtype=None, layout="cells",
                 storage=None):
        self.form = form
        self.key = key
        self.layout = layout
        # storage='df': keep the basis as a float-float PAIR of f32 arrays
        # (solvers/dfloat.py) and run the combine in native-f32 float-float
        # arithmetic, emitting f64. On TPU this loses NOTHING (the device
        # stores f64 as a float-float pair, ~2^-48, anyway) and replaces
        # XLA's emulated-f64 elementwise pass — measured 3.5 GB/s vs the
        # handwritten DF ops' 58 GB/s (tools/df_microbench.py) — making the
        # per-design-iteration re-assembly bandwidth-bound.
        self.storage = storage
        self.powers = tuple(int(p) for p in powers)
        K = len(self.powers)
        nc = form.space.mesh.n_cells
        probes = probe_scale * np.arange(1.0, K + 1.0)
        G = np.stack([probes ** p for p in self.powers], axis=1)  # (K, K)
        Ginv = np.linalg.inv(G)

        # ONE jitted program for the whole basis build (probe assemblies +
        # Vandermonde combine + layout transform + cast): a single dispatch
        # and a single compile per level, instead of an eager-op storm —
        # each eager op on the tunneled TPU costs ~0.35s compile + ~20ms
        # dispatch at setup. On accelerator backends the whole build runs
        # on the host CPU backend (utils/offload.py: the jacfwd assembly
        # program costs minutes of XLA compile per process on the tunneled
        # TPU vs seconds on CPU) and only the finished basis transfers.
        probe_params = [
            params_of(np.full(nc, t, dtype=np.dtype(u0.dtype))) for t in probes
        ]

        def build_basis(u0_, pps):
            Ae_probes = [
                element_matrices(form, u0_, pp, chunk=chunk) for pp in pps
            ]
            basis = []
            for k in range(K):
                Mk = sum(Ginv[k, i] * Ae_probes[i] for i in range(K))
                if layout == "lane":
                    Mk = jnp.moveaxis(Mk, 0, -1)  # (nd, nd, nc), pad-free
                basis.append(Mk.astype(dtype) if dtype is not None else Mk)
            # stacked: one fused elementwise pass in element_matrices()
            out = jnp.stack(basis)
            if storage == "df":
                hi = out.astype(jnp.float32)
                lo = (out - hi.astype(out.dtype)).astype(jnp.float32)
                return hi, lo
            if storage == "f32":
                # correctly-rounded f32 basis: the OPERATOR is f32-accurate
                # by design — the hostloop's host-f64 refinement owns true
                # accuracy, the per-solve attainable true residual with an
                # f32 PRECONDITIONER is ~1e-7 relative regardless, and the
                # f32 combine/matvec run at native bandwidth (the df
                # arithmetic is compute-bound at ~19 GB/s without hardware
                # FMA — tools/combine_breakdown.py)
                return out.astype(jnp.float32)
            return out

        # constant_folding disabled: the jacfwd tangent graph over the
        # embedded cell geometry is largely input-independent, and XLA's
        # single-threaded HLO fold evaluator re-derives most of the
        # assembly at compile time (~2-5x the compile cost for zero
        # runtime benefit on a program run a handful of times)
        built = run_setup(_jit_nofold(build_basis), u0, probe_params)
        if storage == "df":
            from ..solvers.dfloat import DF

            built = DF(*built)
        self.basis = built
        self.nc = nc

    def astype(self, dtype):
        """A view of this operator with the basis cast to `dtype` (e.g. an
        f32 copy feeding a preconditioner hierarchy)."""
        from ..solvers.dfloat import DF

        if isinstance(self.basis, DF):
            raise TypeError("astype is not supported for storage='df'")
        out = object.__new__(AffineDesignOperator)
        out.form, out.key, out.powers = self.form, self.key, self.powers
        out.layout = self.layout
        out.basis = self.basis.astype(dtype)
        out.nc = self.nc
        return out

    def _coeff(self, theta):
        return self._coeff_in(theta, self.basis.dtype)

    def _coeff_in(self, theta, dtype):
        th = jnp.asarray(theta).astype(dtype)
        return jnp.stack([th ** p for p in self.powers])  # (K, nc)

    def element_matrices(self, theta, basis=None):
        """Ae(theta): (nc, nd, nd) for layout='cells', (nd, nd, nc) for
        layout='lane'. Two/three AXPYs — jit/vjp-safe.

        Pass `basis` (this operator's own `.basis`, or a cast of it) to
        thread the basis through a jit boundary as a runtime ARGUMENT:
        closing over `self.basis` embeds ~100MB constants into the compiled
        program (XLA then constant-folds over them at compile time)."""
        B = self.basis if basis is None else basis
        return _affine_combine(B, theta, self.powers, self.layout)

    def matvec(self, theta, space, x):
        """A(theta) @ x without materializing Ae (K cell-matvec passes)."""
        th = jnp.asarray(theta).astype(x.dtype)
        if self.layout == "lane":
            xcT = space.gather_T(x)
            ycT = 0.0
            for k, p in enumerate(self.powers):
                Mk = self.basis[k].astype(x.dtype)
                ycT = ycT + (th ** p)[None, :] * jnp.sum(
                    Mk * xcT[None, :, :], axis=1)
            return space.scatter_add_T(ycT)
        xc = space.gather(x)
        yc = 0.0
        for k, p in enumerate(self.powers):
            Mk = self.basis[k].astype(x.dtype)
            yc = yc + (th ** p)[:, None] * jnp.sum(
                Mk * xc[:, None, :], axis=2)
        return space.scatter_add(yc)

    def vjp_theta(self, theta, u, lam, space, basis=None):
        """lam^T dA(theta)/dtheta u per cell: the design gradient of the
        residual A(theta) u - F (closed form — replaces the jax.vjp through a
        full re-assembly; exact for the declared polynomial dependence).
        `basis`: see element_matrices."""
        B = self.basis if basis is None else basis
        th = jnp.asarray(theta)
        g = jnp.zeros_like(th)
        if self.layout == "lane":
            ucT = space.gather_T(u).astype(B.dtype)
            lcT = space.gather_T(lam).astype(B.dtype)
            for k, p in enumerate(self.powers):
                MuT = jnp.sum(B[k] * ucT[None, :, :], axis=1)
                lam_Mu = jnp.sum(lcT * MuT, axis=0)  # (nc,)
                g = g + (p * th ** (p - 1)) * lam_Mu.astype(th.dtype)
            return g
        uc = space.gather(u).astype(B.dtype)
        lc = space.gather(lam).astype(B.dtype)
        for k, p in enumerate(self.powers):
            Mu = jnp.sum(B[k] * uc[:, None, :], axis=2)  # (nc, nd)
            lam_Mu = jnp.sum(lc * Mu, axis=1)  # (nc,)
            g = g + (p * th ** (p - 1)) * lam_Mu.astype(th.dtype)
        return g

    def verify(self, theta, u0, params_of, rtol=1e-9, chunk=8192):
        """Check the decomposition against one direct assembly at `theta`.
        Raises if the form's design dependence is not the declared
        polynomial (e.g. CG1 nodal thickness, which is NOT per-cell
        polynomial)."""
        direct = run_setup(
            _jit_nofold(lambda u0_, p_: element_matrices(
                self.form, u0_, p_, chunk=chunk)),
            u0, params_of(np.asarray(theta)))
        pred = self.element_matrices(theta).astype(direct.dtype)
        if self.layout == "lane":
            pred = jnp.moveaxis(pred, -1, 0)
        err = float(jnp.max(jnp.abs(pred - direct)))
        scale = float(jnp.max(jnp.abs(direct)))
        # the check can only be as tight as the stored basis dtype (f32
        # bases feed preconditioner hierarchies on TPU) and the device's
        # f64 representation (the tunneled TPU stores f64 as a float-float
        # pair, ~2^-48)
        from ..solvers.dfloat import DF

        eps = (2.0 ** -48 if isinstance(self.basis, DF)
               else float(jnp.finfo(self.basis.dtype).eps))
        rtol = max(rtol, 100.0 * eps, 100.0 * 2.0 ** -48)
        if err > rtol * max(scale, 1e-300):
            raise ValueError(
                f"affine decomposition mismatch: max abs err {err:.3e} vs "
                f"scale {scale:.3e} — design dependence is not "
                f"polynomial with powers {self.powers}")
        return err / max(scale, 1e-300)


class CachedAffineAssembler:
    """`element_matrices_fn` for ImplicitPDE: exact affine re-assembly in the
    design field with HOST-SIDE basis caching over the remaining parameters.

    The affine basis (M_k with Ae = sum_k theta^p_k M_k) depends on every
    parameter EXCEPT the design field (for the RM shell: E, nu, uhat). In
    the dominant optimization pattern only the design changes per iteration,
    so the basis is built once (two probe assemblies) and each linearization
    costs two AXPYs instead of a full jacfwd assembly. When any non-design
    parameter changes value, the basis is rebuilt (detected by content hash
    — eager arrays only). Under tracing of a non-design parameter (e.g.
    jax.grad w.r.t. E) the assembler falls back to direct assembly, so it is
    ALWAYS exact; tracing the design field itself is fine (the affine
    combine is jit/vjp-safe).

    Only valid for operators whose Jacobian is state-independent (linear
    problems) and polynomially dependent on a per-cell design field
    (MID-plane RM shell with DG0 thickness: powers (1, 3)); `verify=True`
    checks the decomposition against one direct assembly at first use.
    """

    def __init__(self, form, key="thickness", powers=(1, 3),
                 probe_scale=None, chunk=8192, dtype=None, layout="cells",
                 out_layout=None, verify=True, ignore_keys=("F_solid",),
                 storage=None):
        self.form = form
        self.key = key
        # storage='df': float-float basis pair + native-f32 combine (see
        # AffineDesignOperator) — the TPU fast path for f64 operators
        self.storage = storage
        # out_layout: layout of the element matrices this assembler RETURNS
        # ('cells' (nc, nd, nd) — default — or 'lane' (nd, nd, nc), the
        # pad-free TPU layout consumed by make_matvec_T / GeometricMG
        # lane_major mode). Independent of `layout`, which is the basis
        # STORAGE layout; store and emit in the same layout to make the
        # combine a pure AXPY with no relayout pass.
        self.out_layout = out_layout or "cells"
        # parameters that do NOT enter the Jacobian (pure load terms):
        # excluded from the cache key and zeroed in the probe assemblies,
        # so a traced or changing load never forces a rebuild/fallback
        self.ignore_keys = tuple(ignore_keys)
        self.powers = powers
        self.chunk = chunk
        self.dtype = dtype
        self.layout = layout
        self.verify = verify
        self.probe_scale = probe_scale
        self._cache_key = None
        self._aff = None

    def _is_concrete(self, x):
        import jax.core

        return not isinstance(x, jax.core.Tracer)

    def prepare(self, params):
        """HOST side: return the affine basis for these parameters (building
        or reusing the cache), or None when a Jacobian-relevant parameter is
        traced (caller must fall back to direct assembly). The returned
        basis is meant to be threaded through jit boundaries as a runtime
        argument and handed back to `__call__(..., basis=...)`."""
        import hashlib

        def _zeros_like(v):
            # ignored keys are zeroed in the probes, so only shape/dtype
            # matter — build with numpy even when v is a tracer (a jnp
            # zeros_like under an ambient trace returns a tracer, which
            # would force the basis build to stage into that trace and
            # leak out of the host-side cache)
            return np.zeros(jnp.shape(v), dtype=np.dtype(v.dtype))

        others = {
            k: (_zeros_like(v) if k in self.ignore_keys else v)
            for k, v in params.items() if k != self.key
        }
        theta = params[self.key]
        relevant = {k: v for k, v in others.items()
                    if k not in self.ignore_keys}
        if not all(self._is_concrete(v) for v in relevant.values()):
            return None
        h = hashlib.sha1()
        for k in sorted(relevant):
            h.update(k.encode())
            h.update(np.asarray(relevant[k]).tobytes())
        ck = h.hexdigest()
        if self._aff is None or ck != self._cache_key:
            ps = self.probe_scale
            if ps is None:
                th_c = (float(np.median(np.asarray(theta)))
                        if self._is_concrete(theta) else 1.0)
                ps = max(abs(th_c), 1e-8)

            def params_of(th):
                return {**others, self.key: th}

            u0 = np.zeros(self.form.space.n_dofs)
            # disk layer (utils/diskcache.py): the basis is a pure function
            # of (mesh, form code, non-design parameters) — child processes
            # (bench scale point / cross-checks) and later sessions reload
            # it instead of re-paying the probe assemblies. The key folds in
            # the mesh arrays and a source-tree fingerprint; the basis is
            # exactly probe-scale-independent (Vandermonde extraction), so
            # ps stays out of the key.
            loaded = self._disk_load(ck)
            if loaded is not None:
                self._aff = loaded
            else:
                self._aff = AffineDesignOperator(
                    self.form, u0, params_of, key=self.key,
                    powers=self.powers, probe_scale=ps, chunk=self.chunk,
                    dtype=self.dtype, layout=self.layout,
                    storage=self.storage)
                if self.verify and self._is_concrete(theta):
                    self._aff.verify(theta, u0, params_of)
                self._disk_store(ck, self._aff)
            self._cache_key = ck
        return self._aff.basis

    # ------------------------------------------------------- disk layer
    def _disk_key(self, ck):
        import hashlib

        mesh = self.form.space.mesh
        h = hashlib.sha1(ck.encode())
        h.update(np.asarray(mesh.coords).tobytes())
        h.update(np.asarray(mesh.conn).tobytes())
        h.update(repr((tuple(self.powers), self.layout, self.storage,
                       str(self.dtype), self.key,
                       self.form.space.n_dofs)).encode())
        return h.hexdigest()

    def _disk_load(self, ck):
        from ..solvers.dfloat import DF
        from ..utils import diskcache

        arrs = diskcache.load("affine", self._disk_key(ck))
        if arrs is None:
            return None
        import jax
        import jax.numpy as jnp

        # validate against the EXPECTED basis geometry before accepting: a
        # loadable-but-wrong-shaped entry would bypass verify() (cache hits
        # skip it) and surface later as shape errors deep inside a solve —
        # or worse, combine into a wrong operator (advisor r4)
        mesh = self.form.space.mesh
        nc = int(mesh.n_cells)
        nd = int(np.asarray(self.form.space.dofmap_d).shape[1])
        K = len(self.powers)
        expected = ((K, nc, nd, nd) if self.layout == "cells"
                    else (K, nd, nd, nc))
        want_n = 2 if self.storage == "df" else 1
        if len(arrs) != want_n or any(
                tuple(a.shape) != expected for a in arrs):
            return None
        if self.storage in ("df", "f32") and any(
                a.dtype != np.float32 for a in arrs):
            return None
        import jax
        import jax.numpy as jnp

        # prepare() may run under an ambient trace (compile_pipeline's
        # eval_shape warm); the loaded basis must be a REAL array, not a
        # trace constant — cached tracers leak out of the host-side cache
        with jax.ensure_compile_time_eval():
            if self.storage == "df":
                basis = DF(jnp.asarray(arrs[0]), jnp.asarray(arrs[1]))
            else:
                basis = jnp.asarray(arrs[0])
        aff = object.__new__(AffineDesignOperator)
        aff.form, aff.key, aff.powers = self.form, self.key, \
            tuple(int(p) for p in self.powers)
        aff.layout = self.layout
        aff.storage = self.storage
        aff.basis = basis
        aff.nc = nc
        return aff

    def _disk_store(self, ck, aff):
        from ..solvers.dfloat import DF
        from ..utils import diskcache

        b = aff.basis
        arrs = [np.asarray(b.hi), np.asarray(b.lo)] if isinstance(b, DF) \
            else [np.asarray(b)]
        diskcache.store("affine", self._disk_key(ck), arrs)

    def combine(self, theta, basis):
        """Traceable affine combine with an explicit basis (plain f64 or
        float-float DF pair); returns element matrices in `out_layout`
        ('cells' (nc, nd, nd) or 'lane' (nd, nd, nc))."""
        out = _affine_combine(basis, theta, self.powers, self.layout)
        if self.layout == "lane":
            return out if self.out_layout == "lane" else jnp.moveaxis(
                out, -1, 0)
        return out if self.out_layout == "cells" else jnp.moveaxis(out, 0, -1)

    def __call__(self, u, params, basis=None):
        if basis is None:
            basis = self.prepare(params)
        if basis is None:
            Ae = element_matrices(self.form, u, params, chunk=self.chunk)
            return (Ae if self.out_layout == "cells"
                    else jnp.moveaxis(Ae, 0, -1))
        return self.combine(params[self.key], basis)
