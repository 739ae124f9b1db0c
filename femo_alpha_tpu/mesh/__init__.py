"""Mesh containers, built-in mesh generation, and mesh I/O.

Replaces the dolfinx C++ mesh/topology layer (SURVEY.md §2.2). Setup-time
topology (edge extraction, boundary facets, dof layouts) is numpy on host;
coordinates/connectivity are transferred to HBM once by the function spaces.
"""

from .mesh import Mesh, LOCAL_EDGES
from .structured import StructuredQuadMesh
from .generation import (
    createIntervalMesh,
    createRectangleMesh,
    createUnitSquareMesh,
    readFEAMesh,
    reconstructFEAMesh,
)
from .wing import createWingShellMesh

__all__ = [
    "Mesh",
    "LOCAL_EDGES",
    "StructuredQuadMesh",
    "createIntervalMesh",
    "createRectangleMesh",
    "createUnitSquareMesh",
    "createWingShellMesh",
    "readFEAMesh",
    "reconstructFEAMesh",
]
