from .space import FunctionSpace, MixedSpace, Function, locate_dofs_geometric

__all__ = ["FunctionSpace", "MixedSpace", "Function", "locate_dofs_geometric"]
