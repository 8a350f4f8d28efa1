"""CenterROIHeads: routes FPN features + FCOS proposals to the mask /
maskiou / keypoint branches.

Rebuilt from reference modeling/centermask/center_heads.py:
- inference: forward_with_given_boxes (:413-444) — pool at adaptively
  assigned FPN level (ratio criterion, pooler.py:80-118), SAG-Mask head,
  per-class mask selection, MaskIoU rescoring,
- training: label_and_sample_proposals (:173-260) — append GT, IoU match
  (Matcher [0.5], labels [0,1], no low-quality matches), subsample 512 per
  image at 25% positive fraction — re-derived with fixed-capacity random
  priority sampling instead of nonzero+randperm.

All per-ROI tensors are padded buffers with validity masks; batch images
are flattened into one ROI axis for pooling (batch_indices select the
image), which keeps one big gather/matmul instead of per-image loops.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from centermask2_tpu.ops import (
    assign_boxes_by_area,
    assign_boxes_by_ratio,
    multilevel_roi_align,
)
from centermask2_tpu.structures import boxes as box_ops
from .mask_head import SpatialAttentionMaskHead, mask_rcnn_inference
from .maskiou_head import MaskIoUHead, mask_iou_inference
from .keypoint_head import KRCNNConvDeconvUpsampleHead


class SampledProposals(NamedTuple):
    """Fixed-capacity training proposals for one image."""

    boxes: jnp.ndarray  # (S, 4)
    gt_classes: jnp.ndarray  # (S,) in [0, C] (C = background)
    gt_indices: jnp.ndarray  # (S,) matched gt row
    valid: jnp.ndarray  # (S,)


def match_proposals(
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_valid: jnp.ndarray,  # (G,)
    proposal_boxes: jnp.ndarray,  # (P, 4)
    iou_thresholds: Sequence[float] = (0.5,),
    iou_labels: Sequence[int] = (0, 1),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """detectron2 Matcher(MODEL.ROI_HEADS.IOU_THRESHOLDS, IOU_LABELS,
    no low-quality matches): returns (matched_idx (P,),
    matched_label (P,)). Labels follow d2 interval semantics —
    ``iou_labels[i]`` for matched IoU in [thr[i-1], thr[i]); 1 = fg,
    0 = bg, -1 = ignore (excluded from sampling downstream)."""
    assert len(iou_labels) == len(iou_thresholds) + 1
    iou = box_ops.pairwise_iou(gt_boxes, proposal_boxes)  # (G, P)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_idx = jnp.argmax(iou, axis=0)
    matched_vals = jnp.max(iou, axis=0)
    interval = sum((matched_vals >= thr).astype(jnp.int32)
                   for thr in iou_thresholds)
    matched_label = jnp.take(jnp.asarray(iou_labels, jnp.int32), interval)
    return matched_idx, matched_label


def subsample_proposals(
    rng: jax.Array,
    fg_mask: jnp.ndarray,  # (P,) eligible positives
    bg_mask: jnp.ndarray,  # (P,) eligible negatives
    batch_size: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random subsample to ``batch_size`` slots with at most
    ``positive_fraction`` positives (detectron2 subsample_labels semantics).

    Returns (indices (batch_size,), is_fg (batch_size,), valid (batch_size,)).
    """
    P = fg_mask.shape[0]
    max_fg = int(batch_size * positive_fraction)
    r = jax.random.uniform(rng, (P,))

    # rank positives by random draw; keep the first max_fg
    fg_rank = jnp.argsort(jnp.argsort(jnp.where(fg_mask, r, 2.0)))
    keep_fg = fg_mask & (fg_rank < max_fg)
    num_fg = jnp.sum(keep_fg.astype(jnp.int32))

    bg_rank = jnp.argsort(jnp.argsort(jnp.where(bg_mask, r, 2.0)))
    keep_bg = bg_mask & (bg_rank < batch_size - num_fg)

    # priority: positives first (3+rand), then negatives (1+rand)
    pri = jnp.where(keep_fg, 3.0 + r, jnp.where(keep_bg, 1.0 + r, -1.0))
    if P < batch_size:  # fewer proposals than sample slots: pad with dead rows
        pri = jnp.concatenate([pri, jnp.full((batch_size - P,), -1.0)])
    top_pri, idx = jax.lax.top_k(pri, batch_size)
    idx = jnp.minimum(idx, P - 1)
    valid = top_pri > 0.0
    is_fg = jnp.take(keep_fg, idx) & valid
    return idx, is_fg, valid


def label_and_sample_proposals(
    rng: jax.Array,
    proposal_boxes: jnp.ndarray,  # (K, 4) from FCOS
    proposal_valid: jnp.ndarray,  # (K,)
    gt_boxes: jnp.ndarray,  # (G, 4) padded
    gt_classes: jnp.ndarray,  # (G,)
    gt_valid: jnp.ndarray,  # (G,)
    num_classes: int,
    batch_size_per_image: int = 512,
    positive_fraction: float = 0.25,
    iou_thresholds: Sequence[float] = (0.5,),
    iou_labels: Sequence[int] = (0, 1),
    append_gt: bool = True,
) -> SampledProposals:
    """Single-image proposal labeling/sampling (center_heads.py:173-260)."""
    if append_gt:
        boxes = jnp.concatenate([proposal_boxes, gt_boxes], axis=0)
        valid = jnp.concatenate([proposal_valid, gt_valid], axis=0)
    else:
        boxes, valid = proposal_boxes, proposal_valid

    matched_idx, matched_label = match_proposals(
        gt_boxes, gt_valid, boxes, iou_thresholds, iou_labels)
    any_gt = jnp.any(gt_valid)
    cls = jnp.take(gt_classes, matched_idx)
    cls = jnp.where(matched_label == 1, cls, num_classes)
    cls = jnp.where(any_gt, cls, num_classes)

    fg = valid & (matched_label == 1) & any_gt
    bg = valid & (matched_label == 0)
    idx, is_fg, sel_valid = subsample_proposals(
        rng, fg, bg, batch_size_per_image, positive_fraction)

    return SampledProposals(
        boxes=jnp.take(boxes, idx, axis=0),
        gt_classes=jnp.where(sel_valid, jnp.take(cls, idx), num_classes),
        gt_indices=jnp.take(matched_idx, idx),
        valid=sel_valid,
    )


class CenterROIHeads(nn.Module):
    """Parameterized branch heads; pooling/assignment are pure ops."""

    num_classes: int = 80
    in_strides: Sequence[int] = (8, 16, 32)  # p3, p4, p5
    mask_on: bool = True
    maskiou_on: bool = True
    keypoint_on: bool = False
    assign_criterion: str = "ratio"
    pooler_resolution: int = 14
    sampling_ratio: int = 2  # static stand-in for adaptive ratio 0
    mask_conv_dims: int = 256
    mask_num_conv: int = 4
    mask_norm: str = ""
    cls_agnostic_mask: bool = False
    maskiou_conv_dims: int = 256
    maskiou_num_conv: int = 4
    num_keypoints: int = 17
    keypoint_conv_dims: Sequence[int] = (512,) * 8
    dtype: Optional[Any] = None

    def setup(self):
        if self.mask_on:
            self.mask_head = SpatialAttentionMaskHead(
                num_classes=self.num_classes, conv_dims=self.mask_conv_dims,
                num_conv=self.mask_num_conv, norm=self.mask_norm,
                cls_agnostic=self.cls_agnostic_mask, dtype=self.dtype)
        if self.maskiou_on:
            self.maskiou_head = MaskIoUHead(
                num_classes=self.num_classes, conv_dims=self.maskiou_conv_dims,
                num_conv=self.maskiou_num_conv,
                input_resolution=self.pooler_resolution, dtype=self.dtype)
        if self.keypoint_on:
            self.keypoint_head = KRCNNConvDeconvUpsampleHead(
                num_keypoints=self.num_keypoints,
                conv_dims=self.keypoint_conv_dims, dtype=self.dtype)

    def _assign_levels(self, flat_boxes, img_areas):
        min_level = 3
        max_level = min_level + len(self.in_strides) - 1
        box_areas = box_ops.area(flat_boxes)
        if self.assign_criterion == "ratio":
            return assign_boxes_by_ratio(box_areas, img_areas, min_level, max_level)
        return assign_boxes_by_area(box_areas, min_level, max_level)

    def pool(self, features: List[jnp.ndarray], flat_boxes, batch_indices,
             img_areas) -> jnp.ndarray:
        levels = self._assign_levels(flat_boxes, img_areas)
        scales = [1.0 / s for s in self.in_strides]
        return multilevel_roi_align(
            features, flat_boxes, batch_indices, levels, scales,
            self.pooler_resolution, self.sampling_ratio, aligned=True)

    def __call__(self, features, boxes, classes, valid, batch_indices,
                 img_areas, scores):
        """Inference path (forward_with_given_boxes).

        features: [p3, p4, p5] NHWC; boxes/classes/valid/scores: flattened
        (R,) ROI buffers; batch_indices: image of each ROI; img_areas: (R,).
        Returns dict with pred_masks (R, M, M) probs and mask_scores (R,).
        """
        out: Dict[str, jnp.ndarray] = {}
        if not self.mask_on:
            return out
        pooled = self.pool(features, boxes, batch_indices, img_areas)
        mask_logits = self.mask_head(pooled)  # (R, 2M, 2M, C)
        mask_probs = mask_rcnn_inference(mask_logits, classes)  # (R, 2M, 2M)
        out["pred_masks"] = mask_probs
        if self.maskiou_on:
            pred_maskiou = self.maskiou_head(pooled, mask_probs[..., None])
            out["mask_scores"] = jnp.where(
                valid, mask_iou_inference(pred_maskiou, classes, scores), 0.0)
        else:
            out["mask_scores"] = jnp.where(valid, scores, 0.0)
        return out

    def mask_forward_train(self, features, boxes, batch_indices, img_areas):
        """Pool + mask head on (padded) foreground proposals; returns
        (pooled (R,14,14,C), mask_logits (R,28,28,C))."""
        pooled = self.pool(features, boxes, batch_indices, img_areas)
        return pooled, self.mask_head(pooled)

    def maskiou_forward(self, pooled, selected_mask):
        return self.maskiou_head(pooled, selected_mask)

    def keypoint_forward(self, features, boxes, batch_indices, img_areas):
        pooled = self.pool(features, boxes, batch_indices, img_areas)
        return self.keypoint_head(pooled)
