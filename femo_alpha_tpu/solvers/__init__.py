from .krylov import cg_solve, cg_solve_hostloop, gmres_solve
from .direct import dense_from_elements, DenseSolver
from .precond import jacobi_preconditioner, block_jacobi_preconditioner
from .newton import newton_solve
from .linear import LinearSolver
from .multigrid import GeometricMG, make_space_transfer
from .band import BandCholPrecond, band_precond_factory
from .eigen import lobpcg, dense_generalized_eigh

__all__ = [
    "lobpcg",
    "dense_generalized_eigh",
    "cg_solve",
    "cg_solve_hostloop",
    "gmres_solve",
    "dense_from_elements",
    "DenseSolver",
    "jacobi_preconditioner",
    "block_jacobi_preconditioner",
    "newton_solve",
    "LinearSolver",
    "GeometricMG",
    "make_space_transfer",
    "BandCholPrecond",
    "band_precond_factory",
]
