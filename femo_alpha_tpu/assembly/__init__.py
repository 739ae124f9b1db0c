from .geometry import cell_jacobian, det_metric, inv_2x2, det_2x2
from .assemble import (
    FemForm,
    assemble_scalar,
    assemble_residual,
    element_matrices,
    make_matvec,
    scatter_add,
)
from .bc import DirichletBC, combine_bcs, constrain_matvec, lift_rhs
from .sparse import CSRPattern

__all__ = [
    "cell_jacobian",
    "det_metric",
    "inv_2x2",
    "det_2x2",
    "FemForm",
    "assemble_scalar",
    "assemble_residual",
    "element_matrices",
    "make_matvec",
    "scatter_add",
    "DirichletBC",
    "combine_bcs",
    "constrain_matvec",
    "lift_rhs",
    "CSRPattern",
]
