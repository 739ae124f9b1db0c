"""csdl_alpha_opt parity layer (SURVEY.md layer 2).

The reference adapts FEA problems into csdl graph operations
(csdl_alpha_opt/: fea_model.py, state_operation.py, output_operation.py).
Here the graph engine is JAX itself, so FEAModel.evaluate is already a
differentiable function; these classes additionally expose the reference's
four-method operation CONTRACT (evaluate / solve_residual_equations /
compute_jacvec_product / apply_inverse_jacobian) for users migrating custom
csdl operations.
"""

from .state_operation import StateOperation
from .output_operation import OutputOperation, OutputFieldOperation

__all__ = ["StateOperation", "OutputOperation", "OutputFieldOperation"]
