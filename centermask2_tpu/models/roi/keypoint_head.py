"""Keypoint head (KRCNN conv-deconv-upsample) + heatmap loss/decode.

Rebuilt from reference modeling/centermask/keypoint_head.py:173-224
(8x conv3x3(512)+ReLU -> ConvTranspose2d(k4,s2,p1) to K channels ->
bilinear 2x upsample) and :30-115 (cross-entropy heatmap loss; decode to
(x, y, score)).

TPU divergence note: detectron2's decode resizes each heatmap to the ROI's
pixel size before argmax; here the argmax runs on the fixed 56x56 heatmap
and is mapped to image coordinates — same keypoint up to heatmap-cell
resolution, static shapes. (KEYPOINT_ON is false in all shipped reference
configs.)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from centermask2_tpu.layers import kaiming_normal_fan_out


class KRCNNConvDeconvUpsampleHead(nn.Module):
    num_keypoints: int = 17
    conv_dims: Sequence[int] = (512,) * 8
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(R, 14, 14, C) -> (R, 56, 56, K) keypoint logits."""
        for idx, ch in enumerate(self.conv_dims, 1):
            x = nn.Conv(
                ch, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                kernel_init=kaiming_normal_fan_out(), dtype=self.dtype,
                param_dtype=jnp.float32, name=f"conv_fcn{idx}",
            )(x)
            x = jax.nn.relu(x)
        # torch ConvTranspose2d(k=4, s=2, p=1): kernel (kh,kw,out,in)
        kernel = self.param(
            "score_lowres_kernel", kaiming_normal_fan_out(),
            (4, 4, self.num_keypoints, x.shape[-1]), jnp.float32)
        bias = self.param("score_lowres_bias", nn.initializers.zeros_init(),
                          (self.num_keypoints,), jnp.float32)
        dtype = self.dtype or x.dtype
        x = jax.lax.conv_transpose(
            x.astype(dtype), kernel.astype(dtype), strides=(2, 2),
            padding=((1, 1), (1, 1)), transpose_kernel=True,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(dtype)
        # bilinear x2, align_corners=False (half-pixel centers)
        R, H, W, K = x.shape
        x = jax.image.resize(x, (R, H * 2, W * 2, K), method="bilinear")
        return x


def keypoint_rcnn_inference(
    keypoint_logits: jnp.ndarray,  # (R, S, S, K)
    boxes: jnp.ndarray,  # (R, 4)
) -> jnp.ndarray:
    """Heatmap argmax -> image-space (x, y, score): (R, K, 3)."""
    R, S, _, K = keypoint_logits.shape
    flat = keypoint_logits.reshape(R, S * S, K)
    idx = jnp.argmax(flat, axis=1)  # (R, K)
    score = jnp.max(flat, axis=1)
    py = (idx // S).astype(jnp.float32) + 0.5
    px = (idx % S).astype(jnp.float32) + 0.5
    w = (boxes[:, 2] - boxes[:, 0])[:, None]
    h = (boxes[:, 3] - boxes[:, 1])[:, None]
    x = boxes[:, 0][:, None] + px / S * w
    y = boxes[:, 1][:, None] + py / S * h
    return jnp.stack([x, y, score.astype(jnp.float32)], axis=-1)


def keypoints_to_heatmap(
    keypoints: jnp.ndarray,  # (R, K, 3) x, y, vis
    boxes: jnp.ndarray,  # (R, 4)
    heatmap_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """detectron2 Keypoints.to_heatmap math: per-ROI grid index of each
    keypoint + validity (inside box and visible). Returns
    (heatmap_index (R, K) int32, valid (R, K) bool)."""
    S = heatmap_size
    x0 = boxes[:, 0:1]
    y0 = boxes[:, 1:2]
    scale_x = S / jnp.maximum(boxes[:, 2:3] - x0, 1e-6)
    scale_y = S / jnp.maximum(boxes[:, 3:4] - y0, 1e-6)

    kx, ky, vis = keypoints[..., 0], keypoints[..., 1], keypoints[..., 2]
    x = (kx - x0) * scale_x
    y = (ky - y0) * scale_y
    x_idx = jnp.clip(jnp.floor(x), 0, S - 1).astype(jnp.int32)
    y_idx = jnp.clip(jnp.floor(y), 0, S - 1).astype(jnp.int32)
    inside = (x >= 0) & (x < S) & (y >= 0) & (y < S)
    valid = inside & (vis > 0)
    return y_idx * S + x_idx, valid


def keypoint_rcnn_loss(
    keypoint_logits: jnp.ndarray,  # (R, S, S, K)
    heatmap_targets: jnp.ndarray,  # (R, K) int flat index into S*S
    valid: jnp.ndarray,  # (R, K) bool visible-and-inside
    normalizer: Optional[float] = None,
) -> jnp.ndarray:
    """Softmax cross-entropy over heatmap cells on valid keypoints
    (reference keypoint_head.py:30-86), masked form."""
    R, S, _, K = keypoint_logits.shape
    logits = keypoint_logits.reshape(R, S * S, K).transpose(0, 2, 1).reshape(
        R * K, S * S).astype(jnp.float32)
    targets = heatmap_targets.reshape(R * K)
    v = valid.reshape(R * K).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
    total = jnp.sum(nll * v)
    norm = jnp.sum(v) if normalizer is None else normalizer
    return jnp.where(jnp.sum(v) > 0, total / jnp.maximum(norm, 1.0), 0.0)
