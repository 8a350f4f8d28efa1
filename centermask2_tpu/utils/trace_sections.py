"""Canonical pipeline-section buckets for device-trace attribution.

Single source of truth for mapping an XLA op's jax module path (the
``tf_op``/metadata string in a captured profiler trace) to a pipeline
section. Shared by tools/profile_model.py (per-op rollup) and
tools/roofline_bound.py (attainable-bound table) so the two views of the
same trace always bucket ops identically and README section numbers are
cross-checkable between them.
"""

from __future__ import annotations

SECTIONS = (
    ("host/normalize+s2d", ("_normalize_u8_s2d", "_pad_to_canvas")),
    ("backbone", ("features/backbone",)),
    ("fpn", ("features/fpn",)),
    ("fcos_head", ("_fcos_raw", "fcos_head")),
    ("decode+nms", ("_decode",)),
    ("roi+mask+maskiou", ("roi_heads", "mask_head", "maskiou",
                          "mask_rcnn_inference", "roi_align",
                          "CenterROIHeads", "MaskIoU")),
    ("keypoint", ("keypoint",)),
    ("losses/assign", ("CenterMask.loss", "fcos_losses", "_assign",
                       "crop_and_resize")),
    ("optimizer", ("optimizer", "apply_updates", "sgd")),
)


def section_of(path: str, unmatched: str = "(unattributed)") -> str:
    """Section label for a module path; backward ops (under the
    transpose() wrapper of a train trace) get a `` [bwd]`` suffix so
    fwd-vs-bwd efficiency stays visible per section."""
    for name, keys in SECTIONS:
        if any(k in path for k in keys):
            return name + (" [bwd]" if "transpose" in path else "")
    return unmatched
