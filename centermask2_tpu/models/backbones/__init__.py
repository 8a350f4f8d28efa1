from .vovnet import VoVNet, STAGE_SPECS, FEATURE_STRIDES, feature_channels
from .fpn import FPN, upsample_nearest_2x
from .mobilenet import MobileNetV2

__all__ = [
    "VoVNet",
    "STAGE_SPECS",
    "FEATURE_STRIDES",
    "feature_channels",
    "FPN",
    "upsample_nearest_2x",
    "MobileNetV2",
]
