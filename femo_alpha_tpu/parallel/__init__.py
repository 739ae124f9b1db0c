from .sharding import (
    make_device_mesh,
    ShardedAssembler,
    ShardedShellStep,
    ShardedPlateStep,
)

__all__ = ["make_device_mesh", "ShardedAssembler", "ShardedShellStep",
           "ShardedPlateStep"]
