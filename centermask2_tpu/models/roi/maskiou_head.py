"""MaskIoU rescoring head.

Rebuilt from reference modeling/centermask/maskiou_head.py:63-127:
input = concat(mask features 14x14xC, maxpool2x2(pred mask 28x28)),
4 conv3x3 (last stride 2 -> 7x7), 3 FC (1024, 1024, num_classes).
Inference multiplies detection scores by the predicted IoU
(mask_iou_inference, maskiou_head.py:50-60); training is an L2 loss on
positives (maskiou_head.py:18-47).

NHWC note: the first FC consumes the flattened (7, 7, C) activation in
H,W,C order; the torch->flax converter permutes the fc1 weight columns
accordingly.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from centermask2_tpu.layers import kaiming_normal_fan_out, normal_init


class MaskIoUHead(nn.Module):
    num_classes: int = 80
    conv_dims: int = 256
    num_conv: int = 4
    input_resolution: int = 14  # pooled feature side
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """x: (R, 14, 14, C) pooled features; mask: (R, 28, 28, 1) soft mask.
        Returns (R, num_classes) predicted IoUs."""
        # 2x2/s2 max pool of the mask to 14x14
        mask_pool = nn.max_pool(mask, window_shape=(2, 2), strides=(2, 2))
        x = jnp.concatenate([x, mask_pool.astype(x.dtype)], axis=-1)

        stride_last = self.num_conv  # last conv uses stride 2
        for k in range(self.num_conv):
            s = 2 if (k + 1) == self.num_conv else 1
            x = nn.Conv(
                self.conv_dims, kernel_size=(3, 3), strides=(s, s),
                padding=((1, 1), (1, 1)), kernel_init=kaiming_normal_fan_out(),
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"maskiou_fcn{k + 1}",
            )(x)
            x = jax.nn.relu(x)

        x = x.reshape(x.shape[0], -1)  # (R, 7*7*C) in H,W,C order
        x = jax.nn.relu(nn.Dense(1024, kernel_init=kaiming_normal_fan_out(),
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name="maskiou_fc1")(x))
        x = jax.nn.relu(nn.Dense(1024, kernel_init=kaiming_normal_fan_out(),
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name="maskiou_fc2")(x))
        x = nn.Dense(self.num_classes, kernel_init=normal_init(0.01),
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="maskiou")(x)
        return x


def mask_iou_inference(
    pred_maskiou: jnp.ndarray,  # (R, C)
    pred_classes: jnp.ndarray,  # (R,)
    scores: jnp.ndarray,  # (R,)
) -> jnp.ndarray:
    """mask_scores = scores * maskiou[class] (reference maskiou_head.py:50-60)."""
    sel = jnp.take_along_axis(pred_maskiou, pred_classes[:, None], axis=1)[:, 0]
    return scores * sel.astype(scores.dtype)


def mask_iou_loss(
    labels: jnp.ndarray,  # (R,) gt classes of the mask rows
    pred_maskiou: jnp.ndarray,  # (R, C)
    gt_maskiou: jnp.ndarray,  # (R,)
    valid: jnp.ndarray,  # (R,) bool — live mask rows
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """L2 on rows with gt_maskiou > 0, averaged over their count
    (reference maskiou_head.py:18-47), masked form."""
    sel = jnp.take_along_axis(pred_maskiou, labels[:, None], axis=1)[:, 0]
    pos = valid & (gt_maskiou > 0.0)
    posf = pos.astype(jnp.float32)
    n = jnp.sum(posf)
    cond = jnp.abs(sel - gt_maskiou) * posf
    loss = 0.5 * jnp.sum(cond**2) / jnp.maximum(n, 1.0)
    return loss_weight * jnp.where(n > 0, loss, 0.0)
