from .pde import RMShellPDE
from .model import RMShellModel

__all__ = ["RMShellPDE", "RMShellModel"]
