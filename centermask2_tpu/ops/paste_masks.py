"""Paste ROI masks into full-resolution images via separable interpolation.

TPU-native replacement for detectron2's paste_masks_in_image /
ROIMasks.to_bitmasks used by the reference postprocessing
(reference: deploy_utils.py:153-156).

Bilinear resampling of an (M, M) mask into its box footprint is separable,
so instead of a grid-sample gather the paste is two small matmuls per ROI:
out[r] = Wy[r] @ mask[r] @ Wx[r]^T with interpolation matrices
Wy: (H, M), Wx: (W, M). This keeps the op on the MXU with static shapes
(R, H, W) and zero gathers. Matches torch grid_sample(align_corners=False,
padding_mode='zeros') restricted to the box's integer footprint, which is
what detectron2's _do_paste_mask computes.
"""

from __future__ import annotations

import jax.numpy as jnp


def _interp_matrix(starts, ends, size: int, mask_size: int):
    """(R,) box starts/ends along one axis -> (R, size, mask_size) weights."""
    coords = jnp.arange(size, dtype=jnp.float32) + 0.5  # pixel centers
    # mask-space coordinate of each image pixel (align_corners=False)
    span = jnp.maximum(ends - starts, 1e-6)
    m = (coords[None, :] - starts[:, None]) / span[:, None] * mask_size - 0.5
    taps = jnp.arange(mask_size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(m[:, :, None] - taps[None, None, :]))
    # restrict to the box's integer footprint [floor(start), ceil(end))
    inside = (coords[None, :] >= jnp.floor(starts)[:, None]) & (
        coords[None, :] < jnp.ceil(ends)[:, None] + 0.5
    )
    return w * inside[:, :, None]


def paste_masks(
    masks: jnp.ndarray,  # (R, M, M) soft masks in [0, 1]
    boxes: jnp.ndarray,  # (R, 4) xyxy image coords
    image_size,  # (H, W) static
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Paste each mask into its box; returns (R, H, W) bool (or float if
    threshold < 0)."""
    H, W = image_size
    M = masks.shape[-1]
    wy = _interp_matrix(boxes[:, 1], boxes[:, 3], H, M)  # (R, H, M)
    wx = _interp_matrix(boxes[:, 0], boxes[:, 2], W, M)  # (R, W, M)
    out = jnp.einsum("rhm,rmn,rwn->rhw", wy, masks.astype(jnp.float32), wx)
    if threshold >= 0:
        return out > threshold
    return out
