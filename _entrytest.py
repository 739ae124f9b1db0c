import jax
import __graft_entry__ as g

fn, args = g.entry()
print("lowering...", flush=True)
lowered = jax.jit(fn).lower(*args)
print("compiling...", flush=True)
compiled = lowered.compile()
print("entry compile OK", flush=True)
out = compiled(*args)
print("entry run OK:", float(out), flush=True)
