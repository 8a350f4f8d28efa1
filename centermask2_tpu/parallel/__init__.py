from .distributed import (
    all_gather_objects,
    barrier,
    global_mesh,
    init_distributed,
    is_main_process,
    process_subset,
    replicate_from_host,
    shard_host_batch,
)
from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .serve import default_image_sizes, make_dp_inference

__all__ = [
    "all_gather_objects",
    "barrier",
    "batch_sharding",
    "default_image_sizes",
    "global_mesh",
    "init_distributed",
    "is_main_process",
    "make_dp_inference",
    "make_mesh",
    "process_subset",
    "replicate",
    "replicate_from_host",
    "replicated_sharding",
    "shard_batch",
    "shard_host_batch",
]
