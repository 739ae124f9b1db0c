"""stage_value_and_grad (fea/pipeline.py): the two-program staged
pipeline around hostloop solves must reproduce the eager
jax.value_and_grad evaluation exactly — same hostloop programs, same
arithmetic, two jitted glue programs instead of ~280 eager dispatches
(the round-3/5 63k headline compile/wall targets)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _build_bench():
    os.environ["FEMO_HOSTLOOP"] = "1"
    try:
        from femo_alpha_tpu.benchmarks import LibraryBench

        return LibraryBench(nx=64, ny=16)
    finally:
        os.environ.pop("FEMO_HOSTLOOP", None)


def test_staged_matches_eager_value_and_grad():
    b = _build_bench()
    from femo_alpha_tpu.fea.pipeline import _StagedValueAndGrad

    assert isinstance(b._vg, _StagedValueAndGrad), (
        "staging did not engage on the hostloop path")
    (val, u), g = b._vg(b.th0)

    def J(t):
        out = b.model.evaluate(b.f, t, b.E, b.nu, b.rho, is_pressure=True)
        return out.compliance, out.disp_solid

    (v2, u2), g2 = jax.value_and_grad(J, has_aux=True)(b.th0)
    assert abs(float(val) - float(v2)) <= 1e-12 * abs(float(v2))
    assert float(jnp.linalg.norm(u - u2)) <= 1e-10 * float(
        jnp.linalg.norm(u2))
    assert float(jnp.linalg.norm(g - g2)) <= 1e-9 * float(
        jnp.linalg.norm(g2))

    # a second design point exercises the warm-start path through the
    # SAME compiled probe/postgrad programs
    (v3, _), g3 = b._vg(b.th0 * 1.02)
    (v4, _), g4 = jax.value_and_grad(J, has_aux=True)(b.th0 * 1.02)
    assert abs(float(v3) - float(v4)) <= 1e-9 * abs(float(v4))
    assert float(jnp.linalg.norm(g3 - g4)) <= 1e-8 * float(
        jnp.linalg.norm(g4))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
