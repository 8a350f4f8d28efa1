from .select import masked_topk, nonzero_padded, NEG_INF
from .nms import nms_keep_mask, batched_nms, nms_select
from .losses import sigmoid_focal_loss, iou_loss, optax_sigmoid_bce
from .roi_align import (
    roi_align,
    multilevel_roi_align,
    assign_boxes_by_ratio,
    assign_boxes_by_area,
)
from .paste_masks import paste_masks
from .deform_conv import deform_conv2d
from .roi_align_pallas import multilevel_roi_align_pallas

__all__ = [
    "masked_topk",
    "nonzero_padded",
    "NEG_INF",
    "nms_keep_mask",
    "batched_nms",
    "nms_select",
    "sigmoid_focal_loss",
    "iou_loss",
    "optax_sigmoid_bce",
    "roi_align",
    "multilevel_roi_align",
    "assign_boxes_by_ratio",
    "assign_boxes_by_area",
    "paste_masks",
    "deform_conv2d",
    "multilevel_roi_align_pallas",
]
