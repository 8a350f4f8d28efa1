"""Loss primitives: sigmoid focal loss, IoU-family box loss, masked BCE.

Replacements for fvcore sigmoid_focal_loss_jit (used at reference
fcos_outputs.py:99-105) and the reference IOULoss (layers/iou_loss.py:5-54),
re-derived in masked form: invalid rows contribute exactly zero, so padded
buffers never change the math.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Elementwise focal loss (fvcore semantics). No reduction."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_bce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable BCE-with-logits, elementwise
    (== F.binary_cross_entropy_with_logits, reduction='none')."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def iou_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    loss_type: str = "giou",
) -> jnp.ndarray:
    """IoU / linear-IoU / GIoU loss on (l, t, r, b) distance vectors.

    Exact math of reference layers/iou_loss.py:14-54 (note the +1 smoothing
    in the IoU ratio). Returns the (weighted) sum over rows; rows with
    weight 0 contribute nothing, so padding is safe.
    """
    pred_l, pred_t, pred_r, pred_b = [pred[..., i] for i in range(4)]
    tgt_l, tgt_t, tgt_r, tgt_b = [target[..., i] for i in range(4)]

    target_area = (tgt_l + tgt_r) * (tgt_t + tgt_b)
    pred_area = (pred_l + pred_r) * (pred_t + pred_b)

    w_intersect = jnp.minimum(pred_l, tgt_l) + jnp.minimum(pred_r, tgt_r)
    h_intersect = jnp.minimum(pred_b, tgt_b) + jnp.minimum(pred_t, tgt_t)
    g_w = jnp.maximum(pred_l, tgt_l) + jnp.maximum(pred_r, tgt_r)
    g_h = jnp.maximum(pred_b, tgt_b) + jnp.maximum(pred_t, tgt_t)
    ac_union = g_w * g_h

    area_intersect = w_intersect * h_intersect
    area_union = target_area + pred_area - area_intersect

    ious = (area_intersect + 1.0) / (area_union + 1.0)
    gious = ious - (ac_union - area_union) / jnp.where(ac_union == 0, 1.0, ac_union)

    if loss_type == "iou":
        losses = -jnp.log(jnp.clip(ious, 1e-8))
    elif loss_type == "linear_iou":
        losses = 1 - ious
    elif loss_type == "giou":
        losses = 1 - gious
    else:
        raise NotImplementedError(loss_type)

    if weight is not None:
        return jnp.sum(losses * weight)
    return jnp.sum(losses)
