"""Drill into the level-0/1 transfer adjointness failure at 988k: which
transfer type is in use per subspace, does adjointness hold per subspace,
does it hold in f64 numpy (rules out accumulation noise), and does
prolongation reproduce a linear field exactly (interpolation exactness)?

Usage: python tools/transfer_probe.py [nx ny]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    from femo_alpha_tpu.benchmarks import LibraryBench

    b = LibraryBench(nx=nx, ny=ny)
    op = b.model.fea.states["disp_solid"].pde
    mg = op._pc.mg
    rng = np.random.default_rng(7)

    for k in range(len(mg.transfers)):
        t = mg.transfers[k]
        Wc = mg.levels[k + 1]["space"]
        Wf = mg.levels[k]["space"]
        subs = getattr(t, "subs", [t])
        for i, s in enumerate(subs):
            sc = Wc.subspaces[i] if hasattr(Wc, "subspaces") else Wc
            sf = Wf.subspaces[i] if hasattr(Wf, "subspaces") else Wf
            ncs, nfs = int(sc.n_dofs), int(sf.n_dofs)
            xc = rng.standard_normal(ncs)
            yf = rng.standard_normal(nfs)
            # f64 on host via jnp default (x64 enabled on CPU; on TPU this
            # runs emulated f64 — still ~1e-10 accurate)
            Px = np.asarray(s.prolong(jnp.asarray(xc)), dtype=np.float64)
            Ry = np.asarray(s.restrict(jnp.asarray(yf)), dtype=np.float64)
            a = float(Px @ yf)
            b_ = float(xc @ Ry)
            # interpolation exactness: linear field x+2y (+comp offset)
            # per-dof linear field (same linear function in every vector
            # component): prolongation must reproduce it exactly
            cc = np.asarray(sc.dof_coords, dtype=np.float64)
            cf = np.asarray(sf.dof_coords, dtype=np.float64)
            vs = int(getattr(sc, "value_size", 1))
            # dof_coords is per SCALAR dof; dofs interleave components
            # (a*vs + c) — same linear value in every component
            lc = np.repeat(cc[:, 0] + 2.0 * cc[:, 1], vs)
            lf = np.repeat(cf[:, 0] + 2.0 * cf[:, 1], vs)
            Pl = np.asarray(s.prolong(jnp.asarray(lc)), dtype=np.float64)
            exact = float(np.max(np.abs(Pl - lf))) / max(
                float(np.max(np.abs(lf))), 1e-300)
            print(json.dumps({
                "level": k, "sub": i, "type": type(s).__name__,
                "nc": ncs, "nf": nfs,
                "adj_rel": abs(a - b_) / max(abs(a), 1e-300),
                "interp_exactness_err": exact}), flush=True)


if __name__ == "__main__":
    main()
