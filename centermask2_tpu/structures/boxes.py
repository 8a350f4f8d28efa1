"""Functional box ops on (N, 4) XYXY arrays.

TPU-native replacement for detectron2's Boxes class as used by the reference
(pairwise_iou at center_heads.py:229, Boxes.area at pooler.py:101,
clip/nonempty at deploy_utils.py:146-149). All ops are pure jnp functions on
fixed-shape arrays; emptiness is expressed by validity masks, never by
filtering.
"""

from __future__ import annotations

import jax.numpy as jnp


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) xyxy -> (N,) areas."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(M, 4), (N, 4) -> (M, N) intersection areas."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(M, 4), (N, 4) -> (M, N) IoU. Zero where union is zero."""
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = area(boxes1)[:, None]
    a2 = area(boxes2)[None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def clip(boxes: jnp.ndarray, image_size) -> jnp.ndarray:
    """Clip boxes to [0, w] x [0, h]. image_size is (h, w)."""
    h, w = image_size
    x0 = jnp.clip(boxes[..., 0], 0, w)
    y0 = jnp.clip(boxes[..., 1], 0, h)
    x1 = jnp.clip(boxes[..., 2], 0, w)
    y1 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """(N, 4) -> (N,) bool mask of boxes with both sides > threshold."""
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    return (widths > threshold) & (heights > threshold)


def scale(boxes: jnp.ndarray, scale_x: float, scale_y: float) -> jnp.ndarray:
    sx = jnp.asarray(scale_x, boxes.dtype)
    sy = jnp.asarray(scale_y, boxes.dtype)
    return boxes * jnp.stack([sx, sy, sx, sy])
