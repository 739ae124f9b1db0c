from .beam import EulerBernoulliBeamModel
from .rm_shell import RMShellModel, RMShellPDE
from .poisson import NonlinearPoissonModel, PoissonModel
from .elasticity import ElasticityModel

__all__ = [
    "EulerBernoulliBeamModel",
    "RMShellModel",
    "RMShellPDE",
    "NonlinearPoissonModel",
    "PoissonModel",
    "ElasticityModel",
]
