from .beam import EulerBernoulliBeamModel
from .rm_shell import RMShellModel, RMShellPDE

__all__ = ["EulerBernoulliBeamModel", "RMShellModel", "RMShellPDE"]
