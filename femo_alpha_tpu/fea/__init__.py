from .fea import FEA
from .model import FEAModel, VariableGroup

__all__ = ["FEA", "FEAModel", "VariableGroup"]
