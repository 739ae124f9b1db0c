from .beam import EulerBernoulliBeamModel
from .rm_shell import RMShellModel, RMShellPDE
from .poisson import PoissonModel
from .elasticity import ElasticityModel

__all__ = [
    "EulerBernoulliBeamModel",
    "RMShellModel",
    "RMShellPDE",
    "PoissonModel",
    "ElasticityModel",
]
