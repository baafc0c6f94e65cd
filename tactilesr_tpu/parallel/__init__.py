from .dist import (
    all_gather_object,
    gather_object,
    get_rank,
    get_world_size,
    init_distributed,
    is_main_process,
    reduce_dict,
)
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated_sharding,
    resolve_mesh,
    shard_batch_size,
)

__all__ = [
    "make_mesh",
    "resolve_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch_size",
    "DATA_AXIS",
    "MODEL_AXIS",
    "init_distributed",
    "get_rank",
    "get_world_size",
    "is_main_process",
    "reduce_dict",
    "all_gather_object",
    "gather_object",
]
