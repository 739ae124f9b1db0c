from .implicit import ImplicitPDE
from .check import check_totals

__all__ = ["ImplicitPDE", "check_totals"]
