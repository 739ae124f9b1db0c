"""Driver benchmark: RM shell forward+adjoint (one optimizer-iteration
equivalent: objective + exact adjoint gradient w.r.t. the thickness field)
on a structured cantilever plate — the BASELINE.md north-star workload.

Prints ONE JSON line:
  {"metric": ..., "value": wall seconds, "unit": "s", "vs_baseline": ...}

vs_baseline: speedup of this device over the same workload run on the host
CPU backend by the same framework (measured live in a subprocess; the
reference publishes no wall time for this workload — BASELINE.md §'published'
is empty — so the framework's own CPU path is the baseline).

Size via FEMO_BENCH_NX/NY (default 128x32 ~ 63k mixed dofs; fits the compile
+solve budget on the current TPU service — larger sizes pending the
multigrid preconditioner, see COVERAGE.md).
"""

import json
import os
import subprocess
import sys

NX = int(os.environ.get("FEMO_BENCH_NX", "128"))
NY = int(os.environ.get("FEMO_BENCH_NY", "32"))
# 'library' (default): the PRODUCT path, RMShellModel.evaluate + jax.grad
# (staged custom_vjp pipeline). 'staged': the hand-staged ShellBench twin
# kept for comparison.
PIPELINE = os.environ.get("FEMO_BENCH_PIPELINE", "library")


BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


def run_local():
    import jax

    import femo_alpha_tpu  # noqa: F401
    from femo_alpha_tpu.benchmarks import LibraryBench, ShellBench

    cls = LibraryBench if PIPELINE == "library" else ShellBench
    b = cls(nx=NX, ny=NY)
    out = b.timed_run(
        repeats=1 if os.environ.get("FEMO_BENCH_CHILD") else 3)
    out["backend"] = jax.default_backend()
    return out


def stored_cpu_baseline():
    try:
        with open(BASELINE_FILE) as f:
            d = json.load(f)
        if (d.get("nx") == NX and d.get("ny") == NY
                and d.get("pipeline", "staged") == PIPELINE):
            return d.get("cpu_wall_s")
    except Exception:
        pass
    return None


def run_cpu_subprocess(timeout=900):
    env = dict(os.environ)
    env["FEMO_PLATFORM"] = "cpu"
    env["FEMO_BENCH_CHILD"] = "1"
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
        for line in res.stdout.strip().splitlines():
            try:
                d = json.loads(line)
                if "wall_s" in d:
                    return d["wall_s"]
            except json.JSONDecodeError:
                continue
    except Exception as e:
        print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)
    return None


def main():
    out = run_local()
    if os.environ.get("FEMO_BENCH_CHILD"):
        print(json.dumps({"wall_s": out["wall_s"]}))
        return
    print(
        f"[bench] {out['backend']} {NX}x{NY} ({out['n_dofs']} dofs): "
        f"wall {out['wall_s']:.3f}s compile {out['compile_s']:.1f}s "
        f"iters fwd/adj {out['iters_fwd']}/{out['iters_adj']} "
        f"rel_res fwd/adj {out['res_fwd']:.2e}/{out['res_adj']:.2e} "
        f"tip {out['tip']:.6e} J {out['J']:.6e}",
        file=sys.stderr,
    )
    cpu_wall = None
    if out["backend"] != "cpu":
        cpu_wall = stored_cpu_baseline()
        if cpu_wall:
            print(f"[bench] cpu baseline wall (stored): {cpu_wall:.3f}s",
                  file=sys.stderr)
        else:
            cpu_wall = run_cpu_subprocess()
            if cpu_wall:
                print(f"[bench] cpu baseline wall: {cpu_wall:.3f}s",
                      file=sys.stderr)
                try:
                    with open(BASELINE_FILE, "w") as f:
                        json.dump({"nx": NX, "ny": NY,
                                   "pipeline": PIPELINE,
                                   "cpu_wall_s": cpu_wall}, f)
                except OSError:
                    pass
    vs = (cpu_wall / out["wall_s"]) if cpu_wall else 1.0
    print(
        json.dumps(
            {
                "metric": (
                    f"rm_shell_fwd_adjoint_{out['n_dofs']}dofs_wall"
                ),
                "value": round(out["wall_s"], 4),
                "unit": "s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
