"""Static-shape (padded) NMS.

TPU-native replacement for torchvision ``batched_nms`` as used at
reference ml_nms.py:93 and for the fixed-output ``BatchMultiClassNMS``
device op (ml_nms.py:7-36): greedy class-aware NMS over a fixed-capacity
candidate buffer, returning a fixed number of output slots plus validity.

Exact greedy semantics (identical suppression decisions to the sequential
CUDA/CPU algorithm) via a fori_loop over the score-sorted candidates; the
IoU matrix is formed once on the VPU. Class separation uses the
torchvision coordinate-offset trick so one IoU matrix serves all classes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from centermask2_tpu.structures import boxes as box_ops


def nms_keep_mask(
    boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float
) -> jnp.ndarray:
    """Greedy NMS over (N, 4) boxes; returns kept mask (N,) bool.

    Candidates are processed in descending score order. Invalid rows never
    suppress and are never kept.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    sboxes = jnp.take(boxes, order, axis=0)
    svalid = jnp.take(valid, order)

    iou = box_ops.pairwise_iou(sboxes, sboxes)
    idx = jnp.arange(n)

    def body(i, keep):
        row = jax.lax.dynamic_slice_in_dim(iou, i, 1, axis=0)[0]
        kept_i = keep[i]
        sup = kept_i & (row > iou_threshold) & (idx > i)
        return keep & ~sup

    keep_sorted = jax.lax.fori_loop(0, n, body, svalid)
    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Class-aware NMS via per-class coordinate offsets
    (torchvision batched_nms trick). Returns kept mask (N,)."""
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    offsets = classes.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms_keep_mask(shifted, scores, valid, iou_threshold)


def nms_select(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS + top-``max_out`` by score.

    Returns (indices (max_out,), out_valid (max_out,)) into the input
    buffers, ordered by descending score — the static equivalent of
    ml_nms + post-NMS topk (reference fcos_outputs.py:468-495).
    """
    keep = batched_nms(boxes, scores, classes, valid, iou_threshold)
    kept_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(kept_scores, max_out)
    out_valid = top_scores > -jnp.inf
    return idx, out_valid
