"""Verify each MG level's affine-assembled element matrices against a
direct per-cell assembly of that level's form (the MG level assemblers run
with verify=False + disk cache; a stale/corrupt cached basis poisons the
V-cycle silently). Prints max relative error per level.

Usage: python tools/mg_basis_check.py [nx ny]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    from femo_alpha_tpu.benchmarks import LibraryBench
    from femo_alpha_tpu.assembly.assemble import element_matrices
    from femo_alpha_tpu.utils.offload import run_setup

    b = LibraryBench(nx=nx, ny=ny)
    op = b.model.fea.states["disp_solid"].pde
    hl = op._hostloop
    params = {"thickness": b.th0, "E": b.E, "nu": b.nu,
              "uhat": jnp.zeros_like(b.f), "F_solid": b.f}
    u0 = jnp.zeros(op.n_dofs)
    aux = op._prepare_aux(params)
    u, ops_Ae, state = hl._asm_affine(params, u0, aux)
    mg = op._pc.mg

    p = {k: params[k] for k in ("thickness", "E", "nu", "uhat", "F_solid")}
    p = jax.tree.map(lambda a: a.astype(jnp.float32), p)
    for k, lev in enumerate(mg.levels):
        Ae = state["Ae"][k]
        Ae_cm = np.asarray(jnp.moveaxis(Ae, -1, 0) if mg.lane_major else Ae,
                           dtype=np.float64)
        asm = lev.get("affine_asm")
        form_k = asm.form if asm is not None else None
        if form_k is None:
            print(json.dumps({"level": k, "skipped": "no affine asm"}))
            continue
        u0k = np.zeros(form_k.space.n_dofs, dtype=np.float32)

        def direct(p, form_k=form_k, u0k=u0k):
            return element_matrices(form_k, u0k, p, chunk=8192)

        ref = np.asarray(run_setup(jax.jit(direct),
                                   jax.tree.map(np.asarray, p)),
                         dtype=np.float64)
        scale = float(np.max(np.abs(ref)))
        err = float(np.max(np.abs(Ae_cm - ref))) / scale
        print(json.dumps({"level": k, "nc": int(ref.shape[0]),
                          "max_rel_err": err, "scale": scale}), flush=True)
        if "coarsen" in lev:
            p = lev["coarsen"](p)


if __name__ == "__main__":
    main()
