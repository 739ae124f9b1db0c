"""Transient gust-workload benchmark through the CURRENT library stack:
`PlateSim.simulate_outputs` (two-level checkpointed scan, online outputs)
forward and forward+adjoint on a 1-cos gust load history — the
time-dependent analogue of the reference's dynamic shell workload
(reference `femo_alpha/dynamic_rm_shell/plate_sim.py` + the
`state_operation_dynamic.py` transient adjoint, which materializes the
full history; here adjoint memory is O(sqrt(N_t)*n)).

Run on CPU and on TPU to compare. Prints one JSON line:
  {"metric": "transient_fwd_adjoint_<ndofs>dofs_<N>steps_wall", ...}

Size knobs: FEMO_TR_NX/NY (default 40x20 ~ 11.7k mixed dofs),
FEMO_TR_NSTEPS (default 50).
Mode knob: FEMO_TR_MODE=checkpointed (default; simulate_outputs, the
two-level checkpointed scan) | plain (sim.simulate materializing the full
history + summed strain-energy output) — the SAME-STACK comparison the
round-4 verdict asked for (the old 17.3 s plain number was a round-1
measurement on a different stack).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import femo_alpha_tpu  # noqa: F401  (platform/x64 config)
    from femo_alpha_tpu.mesh import createRectangleMesh
    from femo_alpha_tpu.models.dynamic_rm_shell import PlateSim

    jax.devices()
    # liveness marker for init-hang watchdogs (see bench.py _probe_backend)
    print("FEMOLIFE", file=sys.stderr, flush=True)

    nx = int(os.environ.get("FEMO_TR_NX", "40"))
    ny = int(os.environ.get("FEMO_TR_NY", "20"))
    nsteps = int(os.environ.get("FEMO_TR_NSTEPS", "50"))
    mesh = createRectangleMesh(nx, ny, (0, 0), (10.0, 2.0), "quad", gdim=3)
    sim = PlateSim(mesh, E=4.32e8, nu=0.0, rho=100.0, dt=0.01,
                   Nsteps=nsteps, element_wise_thickness=True)
    n_dofs = sim.fe_dofs

    # 1-cos gust: uniform pressure-like z load modulated in time over the
    # first half of the horizon (the gust passes), then zero (free response)
    nn = mesh.n_nodes
    f_base = np.zeros(3 * nn)
    f_base[2::3] = 10.0
    t = np.arange(nsteps + 1) * sim.dt
    T_gust = 0.5 * nsteps * sim.dt
    amp = np.where(t <= T_gust,
                   0.5 * (1.0 - np.cos(2.0 * np.pi * t / T_gust)), 0.0)
    fh = jnp.asarray(amp[:, None] * f_base[None, :])

    th0 = jnp.full(sim.num_var, 0.1)

    mode = os.environ.get("FEMO_TR_MODE", "checkpointed")
    if mode == "plain":

        def total_energy(th):
            w_hist = sim.simulate(th, fh)
            return jnp.sum(sim.strain_energy_history(w_hist, th))
    else:

        def total_energy(th):
            out = sim.simulate_outputs(th, fh)
            return jnp.reshape(out["total_strain_energy"], ())

    fwd = jax.jit(total_energy)
    vg = jax.jit(jax.value_and_grad(total_energy))
    reps = int(os.environ.get("FEMO_TR_REPS", "3"))

    t0 = time.perf_counter()
    e0 = float(fwd(th0))
    fwd_first = time.perf_counter() - t0
    print(f"[transient_bench] fwd first {fwd_first:.2f}s", file=sys.stderr,
          flush=True)
    walls_f = []
    for i in range(reps):
        thi = th0 * (1.0 + 0.01 * (i + 1))
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(thi))
        walls_f.append(time.perf_counter() - t0)
        print(f"[transient_bench] fwd steady {walls_f[-1]:.2f}s",
              file=sys.stderr, flush=True)
    fwd_wall = float(np.median(walls_f))

    t0 = time.perf_counter()
    v, g = vg(th0)
    jax.block_until_ready(g)
    vg_first = time.perf_counter() - t0
    print(f"[transient_bench] fwd+adj first {vg_first:.2f}s",
          file=sys.stderr, flush=True)
    walls = []
    for i in range(reps):
        thi = th0 * (1.0 + 0.01 * (i + 1))
        t0 = time.perf_counter()
        _, gi = vg(thi)
        jax.block_until_ready(gi)
        walls.append(time.perf_counter() - t0)
        print(f"[transient_bench] fwd+adj steady {walls[-1]:.2f}s",
              file=sys.stderr, flush=True)
    wall = float(np.median(walls))

    gn = float(jnp.linalg.norm(g))
    print(f"[transient_bench] {jax.default_backend()} {n_dofs} dofs x "
          f"{nsteps} steps: fwd first {fwd_first:.2f}s steady "
          f"{fwd_wall:.3f}s | fwd+adj first {vg_first:.2f}s steady "
          f"{wall:.3f}s | E {e0:.6e} |g| {gn:.3e}", file=sys.stderr)
    print(json.dumps({
        "metric": f"transient_fwd_adjoint_{n_dofs}dofs_{nsteps}steps_wall",
        "value": round(wall, 4),
        "unit": "s",
        "mode": mode,
        "fwd_wall_s": round(fwd_wall, 4),
        "backend": jax.default_backend(),
        "compile_s": round(vg_first - wall, 1),
        "total_strain_energy": e0,
        "grad_norm": gn,
    }))


if __name__ == "__main__":
    main()
