from .xdmf import XDMFWriter, write_vtu, read_xdmf_mesh
from .gmsh import read_msh, write_msh
from .recorder import Recorder
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "XDMFWriter",
    "write_vtu",
    "read_xdmf_mesh",
    "read_msh",
    "write_msh",
    "Recorder",
    "save_checkpoint",
    "load_checkpoint",
]
