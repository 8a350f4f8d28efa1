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
    """Returns infer(params, images, image_sizes, valid_hw=None)
    -> InferenceOutputs.

    ``images``: (B, H, W, C) with B divisible by the mesh size; outputs
    keep the global batch dim, sharded over ``axis``. Place inputs with
    parallel.shard_batch and params with parallel.replicate.
    ``valid_hw``: (B, 2) int32 true resized sizes, required only for RAW
    uint8 s2d inputs (4x fewer host->device bytes; on-device
    normalization) — defaults to the full canvas.
    """
    rep, sh = P(), P(axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, sh, sh, sh), out_specs=sh, check_rep=False,
    )
    def step(params, images, image_sizes, valid_hw):
        return model.apply(params, images, image_sizes, valid_hw,
                           method=CenterMask.inference_batched)

    jitted = jax.jit(step)

    def infer(params, images, image_sizes, valid_hw=None):
        if valid_hw is None:
            H, W = model.canvas_hw(images)
            valid_hw = jnp.tile(jnp.array([[H, W]], jnp.int32),
                                (images.shape[0], 1))
            valid_hw = jax.device_put(
                valid_hw, jax.sharding.NamedSharding(mesh, P(axis)))
        return jitted(params, images, image_sizes, valid_hw)

    return infer


def default_image_sizes(model: CenterMask, images: jnp.ndarray,
                        image_sizes: Optional[Any] = None) -> jnp.ndarray:
    """(B, 2) true (h, w); defaults to the padded canvas (FakeImageList
    contract), accounting for the host s2d input layout."""
    if image_sizes is not None:
        return jnp.asarray(image_sizes, jnp.float32)
    H, W = model.canvas_hw(images)
    return jnp.tile(jnp.array([[H, W]], jnp.float32), (images.shape[0], 1))
