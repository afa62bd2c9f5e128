from .mesh import DATA_AXIS, default_mesh, replicated, row_sharding
from .sharded import ShardedFlat, ShardedIVF

__all__ = [
    "DATA_AXIS",
    "default_mesh",
    "replicated",
    "row_sharding",
    "ShardedFlat",
    "ShardedIVF",
]
