from . import backbones, fcos, roi
from .meta import CenterMask, GroundTruth, InferenceOutputs, build_centermask

__all__ = [
    "backbones",
    "fcos",
    "roi",
    "CenterMask",
    "GroundTruth",
    "InferenceOutputs",
    "build_centermask",
]
