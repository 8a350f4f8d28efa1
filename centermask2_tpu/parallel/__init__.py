from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .serve import default_image_sizes, make_dp_inference

__all__ = [
    "batch_sharding",
    "default_image_sizes",
    "make_dp_inference",
    "make_mesh",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
