from .beam import EulerBernoulliBeamModel

__all__ = ["EulerBernoulliBeamModel"]
