from .krylov import cg_solve, gmres_solve
from .direct import dense_from_elements, DenseSolver
from .precond import jacobi_preconditioner, block_jacobi_preconditioner
from .newton import newton_solve
from .linear import LinearSolver

__all__ = [
    "cg_solve",
    "gmres_solve",
    "dense_from_elements",
    "DenseSolver",
    "jacobi_preconditioner",
    "block_jacobi_preconditioner",
    "newton_solve",
    "LinearSolver",
]
