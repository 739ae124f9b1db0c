"""Finite-difference total-derivative verification.

Parity with the reference's de-facto test harness
`csdl.experimental.PySimulator(recorder).check_totals([outs],[ins])`
(SURVEY.md §4; e.g. ex_simple_shell.py:104-107): compares
reverse-mode totals of scalar outputs against central finite differences.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def check_totals(fn, params, eps=1e-6, directions=3, seed=0, rtol=1e-4,
                 verbose=True):
    """fn: params-pytree -> scalar. Checks jax.grad(fn) against central FD
    along `directions` random directions. Returns max relative error."""
    g = jax.grad(fn)(params)
    leaves, treedef = jax.tree.flatten(params)
    gleaves = jax.tree.leaves(g)
    rng = np.random.default_rng(seed)
    max_rel = 0.0
    for k in range(directions):
        ds = [jnp.asarray(rng.standard_normal(np.shape(l))) for l in leaves]
        pp = treedef.unflatten([l + eps * d for l, d in zip(leaves, ds)])
        pm = treedef.unflatten([l - eps * d for l, d in zip(leaves, ds)])
        fd = (float(fn(pp)) - float(fn(pm))) / (2 * eps)
        ad = float(sum(jnp.vdot(gl, d) for gl, d in zip(gleaves, ds)))
        denom = max(abs(fd), abs(ad), 1e-12)
        rel = abs(fd - ad) / denom
        max_rel = max(max_rel, rel)
        if verbose:
            print(f"check_totals dir {k}: AD={ad:.10e} FD={fd:.10e} rel={rel:.2e}")
    if max_rel > rtol:
        raise AssertionError(f"adjoint/FD mismatch: rel err {max_rel:.3e} > {rtol}")
    return max_rel
