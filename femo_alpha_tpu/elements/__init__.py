"""Reference elements: quadrature rules + basis tabulation.

Replaces the external basix/FFCx layer of the reference (SURVEY.md §2.2):
tables are computed once with numpy at setup time and baked into JAX kernels
as static constants.
"""

from .quadrature import quadrature_rule
from .tabulation import ElementTables, tabulate, reference_element

__all__ = ["quadrature_rule", "ElementTables", "tabulate", "reference_element"]
