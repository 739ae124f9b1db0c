from .logging import log, set_verbosity
from .timing import Timer

__all__ = ["log", "set_verbosity", "Timer"]
