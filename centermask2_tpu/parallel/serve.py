"""Data-parallel batched inference over a device mesh.

The reference serves one image per process (deploy_utils.py:19-21); the
TPU-native scale-out is SPMD: shard the batch over a 1-D ``data`` mesh
and run the optimized single-image program per device (shard_map keeps
each device on the fast B=1 graph via CenterMask.inference_batched's
lax.map). No collectives — throughput scales linearly with chips; the
driver-validated training mesh (parallel/mesh.py) is reused as-is.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from centermask2_tpu.models import CenterMask


def make_dp_inference(model: CenterMask, mesh: Mesh, axis: str = "data"):
    """Returns infer(params, images, image_sizes) -> InferenceOutputs.

    ``images``: (B, H, W, C) with B divisible by the mesh size; outputs
    keep the global batch dim, sharded over ``axis``. Place inputs with
    parallel.shard_batch and params with parallel.replicate.
    """
    rep, sh = P(), P(axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, sh, sh), out_specs=sh, check_rep=False,
    )
    def step(params, images, image_sizes):
        return model.apply(params, images, image_sizes,
                           method=CenterMask.inference_batched)

    return jax.jit(step)


def default_image_sizes(model: CenterMask, images: jnp.ndarray,
                        image_sizes: Optional[Any] = None) -> jnp.ndarray:
    """(B, 2) true (h, w); defaults to the padded canvas (FakeImageList
    contract), accounting for the host s2d input layout."""
    if image_sizes is not None:
        return jnp.asarray(image_sizes, jnp.float32)
    H, W = model.canvas_hw(images)
    return jnp.tile(jnp.array([[H, W]], jnp.float32), (images.shape[0], 1))
