import sys
import jax
import femo_alpha_tpu
from femo_alpha_tpu.benchmarks import ShellBench

print("backend", jax.default_backend(), "x64", jax.config.jax_enable_x64,
      flush=True)
for nx, ny in [(128, 32), (256, 64), (512, 128)]:
    b = ShellBench(nx=nx, ny=ny, mode="refined", refine_passes=6,
                   inner_iters=6000)
    out = b.timed_run(repeats=2)
    print(nx, ny, out, flush=True)
