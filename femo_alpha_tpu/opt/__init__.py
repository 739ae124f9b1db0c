from .problem import OptimizationProblem, SLSQP

__all__ = ["OptimizationProblem", "SLSQP"]
