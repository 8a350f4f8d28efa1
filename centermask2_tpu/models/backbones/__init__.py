from .vovnet import VoVNet, STAGE_SPECS, FEATURE_STRIDES, feature_channels
from .fpn import FPN, upsample_nearest_2x
from .mobilenet import MobileNetV2
from .resnet import (
    ResNet,
    RESNET_FEATURE_STRIDES,
    RESNET_STAGE_BLOCKS,
    resnet_feature_channels,
)

__all__ = [
    "VoVNet",
    "STAGE_SPECS",
    "FEATURE_STRIDES",
    "feature_channels",
    "FPN",
    "upsample_nearest_2x",
    "MobileNetV2",
    "ResNet",
    "RESNET_FEATURE_STRIDES",
    "RESNET_STAGE_BLOCKS",
    "resnet_feature_channels",
]
