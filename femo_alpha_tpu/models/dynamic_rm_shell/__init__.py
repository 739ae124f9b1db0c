from .plate_sim import PlateSim
from .operations import (
    StateOperation,
    TotalStrainEnergyOperation,
    VolumeOperation,
)

__all__ = [
    "PlateSim",
    "StateOperation",
    "TotalStrainEnergyOperation",
    "VolumeOperation",
]
