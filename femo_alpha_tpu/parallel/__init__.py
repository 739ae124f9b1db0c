from .sharding import (
    make_device_mesh,
    ShardedAssembler,
    ShardedShellStep,
)

__all__ = ["make_device_mesh", "ShardedAssembler", "ShardedShellStep"]
