import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
import femo_alpha_tpu
from femo_alpha_tpu.mesh import StructuredQuadMesh
from femo_alpha_tpu.models.rm_shell.pde import RMShellPDE
from femo_alpha_tpu.assembly.assemble import (
    assemble_residual, element_matrices, make_matvec)
from femo_alpha_tpu.assembly.bc import (
    DirichletBC, combine_bcs, constrain_matvec)
from femo_alpha_tpu.spaces import locate_dofs_geometric
from femo_alpha_tpu.solvers.krylov import cg_solve

print("backend", jax.default_backend(), "x64", jax.config.jax_enable_x64,
      flush=True)
NX, NY = 128, 32
mesh = StructuredQuadMesh(NX, NY, (0, 0), (10, 2), gdim=3)
pde = RMShellPDE(mesh, element_wise_material=True, inplane_deg=2,
                 shear_deg=2, stress_deg=2)
W = pde.W
print("ndofs", W.n_dofs, flush=True)
form = pde.make_residual_form()
nel = mesh.n_cells
d1 = locate_dofs_geometric(pde.V_disp, lambda x: x[:, 0] < 1e-12)
d2 = locate_dofs_geometric(pde.V_rot, lambda x: x[:, 0] < 1e-12)
dofs = np.concatenate([d1, d2 + pde.V_disp.n_dofs])
free, _ = combine_bcs(W.n_dofs, [DirichletBC(dofs, 0.0)])
fvec = jnp.zeros(pde.VF.n_dofs).at[2::3].set(2.0)
params = {"thickness": jnp.full(nel, 0.2), "E": jnp.full(nel, 4.32e8),
          "nu": jnp.zeros(nel), "uhat": jnp.zeros(pde.VU.n_dofs),
          "F_solid": fvec}
u0 = jnp.zeros(W.n_dofs)


def solve(p, dtype):
    F = -assemble_residual(form, u0, p)
    Ae = element_matrices(form, u0, p, chunk=8192)
    fr = free.astype(dtype)
    Ae = Ae.astype(dtype)
    b = (fr * F).astype(dtype)
    diag = W.scatter_add(jnp.diagonal(Ae, axis1=1, axis2=2))
    diag = fr * diag + (1.0 - fr)
    inv = jnp.where(diag != 0, 1.0 / diag, 1.0).astype(dtype)
    mv = constrain_matvec(make_matvec(Ae, W), fr)
    x, info = cg_solve(mv, b, M=lambda v: inv * v, tol=1e-8, maxiter=40000)
    return x, info


for dtype in [jnp.float32]:
    s = jax.jit(lambda p: solve(p, dtype))
    t0 = time.time()
    x, info = s(params)
    jax.block_until_ready(x)
    print("compile+run", round(time.time() - t0, 1), flush=True)
    t0 = time.time()
    x, info = s(params)
    jax.block_until_ready(x)
    print(
        dtype.__name__, "wall", round(time.time() - t0, 2),
        "iters", int(info["iters"]), "res", float(info["resnorm"]),
        "tip", float(jnp.max(jnp.abs(x))), "expect 0.00868", flush=True)
