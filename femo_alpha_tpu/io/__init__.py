from .xdmf import XDMFWriter, write_vtu
from .recorder import Recorder
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "XDMFWriter",
    "write_vtu",
    "Recorder",
    "save_checkpoint",
    "load_checkpoint",
]
