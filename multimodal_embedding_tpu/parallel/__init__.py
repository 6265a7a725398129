from .mesh import get_mesh, data_sharding, replicated_sharding, DATA_AXIS
from .batched import sharded_batch_apply, pad_to_multiple

__all__ = [
    "get_mesh",
    "data_sharding",
    "replicated_sharding",
    "DATA_AXIS",
    "sharded_batch_apply",
    "pad_to_multiple",
]
