import json
import femo_alpha_tpu
from femo_alpha_tpu.benchmarks import ShellBench

b = ShellBench(nx=128, ny=32, mode="f64")
out = b.timed_run(repeats=1)
print(json.dumps(out), flush=True)
with open("bench_baseline.json", "w") as f:
    json.dump(
        {"nx": 128, "ny": 32, "n_dofs": out["n_dofs"],
         "cpu_wall_s": out["wall_s"], "mode": "f64",
         "note": "same workload, femo_alpha_tpu CPU backend, 1 repeat"},
        f, indent=1)
