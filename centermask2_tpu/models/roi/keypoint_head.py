"""Keypoint head (KRCNN conv-deconv-upsample) + heatmap loss/decode.

Rebuilt from reference modeling/centermask/keypoint_head.py:173-224
(8x conv3x3(512)+ReLU -> ConvTranspose2d(k4,s2,p1) to K channels ->
bilinear 2x upsample) and :30-115 (cross-entropy heatmap loss; decode to
(x, y, score)).

Decode follows detectron2's heatmaps_to_keypoints (the reference delegates
to it at keypoint_head.py:89-115): per-ROI bicubic upsample of the SxS map,
argmax, half-pixel offset back to image coords, and the
exp-normalized probability score. TPU divergence (static shapes): the
upsample grid is a fixed GRID x GRID (112 default) instead of the ROI's
ceil(h) x ceil(w) pixel grid — keypoint quantization is width/GRID instead
of ~1px (sub-1% of object scale; oracle-tested at tolerance), and jax's
bicubic kernel (Keys a=-0.5) differs from torch's (a=-0.75) at the
fringes. (KEYPOINT_ON is false in all shipped reference configs.)
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
        # torch ConvTranspose2d(k=4, s=2, p=1): kernel (kh,kw,out,in).
        # lax.conv_transpose pad maps as k - 1 - torch_pad = 2 per side
        # (verified value-exact vs torch); the previous ((1,1),(1,1))
        # emitted a 26->52 grid instead of d2's 28->56 — self-consistent
        # (loss targets and decode both adapt to the logits' grid) so
        # only the cross-framework e2e test caught it.
        kernel = self.param(
            "score_lowres_kernel", kaiming_normal_fan_out(),
            (4, 4, self.num_keypoints, x.shape[-1]), jnp.float32)
        bias = self.param("score_lowres_bias", nn.initializers.zeros_init(),
                          (self.num_keypoints,), jnp.float32)
        dtype = self.dtype or x.dtype
        x = jax.lax.conv_transpose(
            x.astype(dtype), kernel.astype(dtype), strides=(2, 2),
            padding=((2, 2), (2, 2)), transpose_kernel=True,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(dtype)
        # bilinear x2, align_corners=False (half-pixel centers)
        R, H, W, K = x.shape
        x = jax.image.resize(x, (R, H * 2, W * 2, K), method="bilinear")
        return x


def heatmaps_to_keypoints(
    keypoint_logits: jnp.ndarray,  # (R, S, S, K)
    boxes: jnp.ndarray,  # (R, 4)
    grid: int = 112,
) -> jnp.ndarray:
    """detectron2 heatmaps_to_keypoints, static-shape form: (R, K, 4) of
    (x, y, logit, prob).

    Each ROI's heatmap is bicubic-upsampled to a fixed grid (d2: the ROI's
    ceil-pixel size), argmaxed, and the cell center mapped back through
    the box: x = x0 + (xi + 0.5)/grid * width. The probability is d2's
    exp(max_up - max_up) / sum(exp(pooled - max_up)) evaluated at the
    argmax cell.
    """
    R, S, _, K = keypoint_logits.shape
    maps = keypoint_logits.astype(jnp.float32)
    up = jax.image.resize(maps, (R, grid, grid, K), method="bicubic")
    flat = up.reshape(R, grid * grid, K)
    idx = jnp.argmax(flat, axis=1)  # (R, K)
    max_up = jnp.max(flat, axis=1)  # (R, K)
    yi = (idx // grid).astype(jnp.float32) + 0.5
    xi = (idx % grid).astype(jnp.float32) + 0.5
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1.0)[:, None]
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1.0)[:, None]
    x = boxes[:, 0][:, None] + xi / grid * w
    y = boxes[:, 1][:, None] + yi / grid * h
    # d2: roi_map_scores = exp(roi_map - max) / sum(exp(pooled - max));
    # at the argmax cell the numerator is exp(0) = 1
    denom = jnp.sum(
        jnp.exp(maps - max_up[:, None, None, :]), axis=(1, 2))  # (R, K)
    prob = 1.0 / jnp.maximum(denom, 1e-12)
    return jnp.stack([x, y, max_up, prob], axis=-1)


def keypoint_rcnn_inference(
    keypoint_logits: jnp.ndarray,  # (R, S, S, K)
    boxes: jnp.ndarray,  # (R, 4)
) -> jnp.ndarray:
    """(R, K, 3) of (x, y, prob) — d2 keypoint_rcnn_inference keeps
    columns [0, 1, 3] of heatmaps_to_keypoints."""
    res = heatmaps_to_keypoints(keypoint_logits, boxes)
    return res[..., jnp.array([0, 1, 3])]


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
    xf = jnp.floor((kx - x0) * scale_x)
    yf = jnp.floor((ky - y0) * scale_y)
    # d2 boundary handling: a keypoint exactly on the right/bottom box
    # edge maps to bin S-1 and stays valid
    xf = jnp.where(kx == boxes[:, 2:3], S - 1, xf)
    yf = jnp.where(ky == boxes[:, 3:4], S - 1, yf)
    inside = (xf >= 0) & (xf < S) & (yf >= 0) & (yf < S)
    x_idx = jnp.clip(xf, 0, S - 1).astype(jnp.int32)
    y_idx = jnp.clip(yf, 0, S - 1).astype(jnp.int32)
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
