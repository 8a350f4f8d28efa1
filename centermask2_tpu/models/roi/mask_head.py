"""Mask heads: SAG-Mask (spatial attention) and plain Mask R-CNN head.

Rebuilt from reference modeling/centermask/sam.py:31-97 and
mask_head.py:219-281: 4x conv3x3(256)+ReLU (bias, no norm in shipped
configs) -> [spatial attention] -> 2x2/s2 deconv + ReLU -> 1x1 predictor
with num_classes channels. Operates on (R, 14, 14, C) pooled features,
produces (R, 28, 28, num_classes) logits.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from centermask2_tpu.layers import (
    ConvTranspose2d,
    SpatialAttention,
    get_norm,
    kaiming_normal_fan_out,
    normal_init,
)


class SpatialAttentionMaskHead(nn.Module):
    num_classes: int = 80
    conv_dims: int = 256
    num_conv: int = 4
    norm: str = ""
    cls_agnostic: bool = False
    use_spatial_attention: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for k in range(self.num_conv):
            x = nn.Conv(
                self.conv_dims, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                use_bias=not self.norm, kernel_init=kaiming_normal_fan_out(),
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"mask_fcn{k + 1}",
            )(x)
            norm = get_norm(self.norm, self.conv_dims, name=f"mask_fcn{k + 1}_norm")
            if norm is not None:
                x = norm(x)
            x = jax.nn.relu(x)
        if self.use_spatial_attention:
            x = SpatialAttention(dtype=self.dtype, name="spatialAtt")(x)
        x = ConvTranspose2d(
            self.conv_dims, kernel_size=(2, 2), strides=(2, 2),
            kernel_init=kaiming_normal_fan_out(), dtype=self.dtype, name="deconv",
        )(x)
        x = jax.nn.relu(x)
        num_out = 1 if self.cls_agnostic else self.num_classes
        x = nn.Conv(
            num_out, kernel_size=(1, 1), kernel_init=normal_init(0.001),
            dtype=self.dtype, param_dtype=jnp.float32, name="predictor",
        )(x)
        return x


def MaskRCNNConvUpsampleHead(**kwargs) -> SpatialAttentionMaskHead:
    """Plain head = SAG head without the attention gate
    (reference mask_head.py:219-281)."""
    return SpatialAttentionMaskHead(use_spatial_attention=False, **kwargs)


def mask_rcnn_inference(
    mask_logits: jnp.ndarray,  # (R, 28, 28, C) or (R, 28, 28, 1)
    pred_classes: jnp.ndarray,  # (R,)
) -> jnp.ndarray:
    """Per-class mask selection + sigmoid (reference mask_head.py:174-216).
    Returns (R, 28, 28) probabilities."""
    if mask_logits.shape[-1] == 1:
        sel = mask_logits[..., 0]
    else:
        # one-hot contraction instead of take_along_axis: the broadcast
        # spatial dims make the gather per-element (scalar-at-a-time on
        # TPU); the einsum is one MXU matmul and bit-exact (exactly one
        # nonzero per row, so no accumulation-order effects)
        sel = jnp.einsum(
            "rhwc,rc->rhw", mask_logits,
            jax.nn.one_hot(pred_classes, mask_logits.shape[-1],
                           dtype=mask_logits.dtype))
    return jax.nn.sigmoid(sel.astype(jnp.float32))
