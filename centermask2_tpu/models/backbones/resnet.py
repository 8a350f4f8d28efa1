"""ResNet bottom-up for the FCOS-FPN builder, NHWC flax.

The reference's ``build_fcos_resnet_fpn_backbone`` (reference:
centermask2/centermask/modeling/backbone/fpn.py:56-87) wraps detectron2's
``build_resnet_backbone``; the model itself lives in detectron2. This is a
from-scratch TPU-native ResNet with detectron2's exact semantics for the
configs the reference can name:

- BasicStem: conv7x7/s2 + FrozenBN + relu + maxpool3x3/s2/p1,
- BottleneckBlock: 1x1 -> 3x3 -> 1x1 (stride in the 1x1 when
  STRIDE_IN_1X1, the caffe/MSRA convention detectron2 defaults to),
  projection shortcut on the first block of each stage,
- depths 50 / 101 / 152 (Bottleneck counts [3,4,6,3] / [3,4,23,3] /
  [3,8,36,3]).

Param names mirror detectron2's module names (stem.conv1, res2.0.conv1,
shortcut) so the checkpoint converter maps keys 1:1.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from centermask2_tpu.layers import ConvNormAct, get_norm, kaiming_normal_fan_out

RESNET_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
RESNET_FEATURE_STRIDES = {"stem": 4, "res2": 4, "res3": 8, "res4": 16, "res5": 32}


def resnet_feature_channels(res2_out: int = 256) -> Dict[str, int]:
    return {f"res{i + 2}": res2_out * (2 ** i) for i in range(4)}


class BottleneckBlock(nn.Module):
    """detectron2 BottleneckBlock: 1x1 -> 3x3 -> 1x1 with residual."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    num_groups: int = 1
    dilation: int = 1
    norm: str = "FrozenBN"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        s1, s3 = ((self.stride, 1) if self.stride_in_1x1 else (1, self.stride))
        out = ConvNormAct(
            self.bottleneck_channels, kernel_size=(1, 1), strides=(s1, s1),
            padding=(0, 0), norm=self.norm, dtype=self.dtype, name="conv1")(x)
        out = ConvNormAct(
            self.bottleneck_channels, kernel_size=(3, 3), strides=(s3, s3),
            padding=(self.dilation, self.dilation), groups=self.num_groups,
            norm=self.norm, dtype=self.dtype, name="conv2")(out)
        out = ConvNormAct(
            self.out_channels, kernel_size=(1, 1), padding=(0, 0),
            norm=self.norm, use_act=False, dtype=self.dtype, name="conv3")(out)
        if in_ch != self.out_channels or self.stride != 1:
            shortcut = ConvNormAct(
                self.out_channels, kernel_size=(1, 1),
                strides=(self.stride, self.stride), padding=(0, 0),
                norm=self.norm, use_act=False, dtype=self.dtype,
                name="shortcut")(x)
        else:
            shortcut = x
        return jax.nn.relu(out + shortcut)


class ResNet(nn.Module):
    """detectron2-semantics ResNet trunk returning the requested stages."""

    depth: int = 50
    out_features: Sequence[str] = ("res3", "res4", "res5")
    norm: str = "FrozenBN"
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        # BasicStem (detectron2 resnet.py): conv7x7/s2/p3 + norm + relu,
        # then maxpool3x3/s2/p1
        x = ConvNormAct(
            self.stem_out_channels, kernel_size=(7, 7), strides=(2, 2),
            padding=(3, 3), norm=self.norm, dtype=self.dtype,
            name="stem_conv1")(x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)))

        outputs: Dict[str, jnp.ndarray] = {}
        if "stem" in self.out_features:
            outputs["stem"] = x
        blocks_per_stage = RESNET_STAGE_BLOCKS[self.depth]
        bottleneck = self.num_groups * self.width_per_group
        out_ch = self.res2_out_channels
        for i, n_blocks in enumerate(blocks_per_stage):
            stage = i + 2
            dilation = self.res5_dilation if stage == 5 else 1
            first_stride = 1 if stage == 2 or (
                stage == 5 and dilation == 2) else 2
            for b in range(n_blocks):
                x = BottleneckBlock(
                    out_channels=out_ch,
                    bottleneck_channels=bottleneck,
                    stride=first_stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    num_groups=self.num_groups,
                    dilation=dilation,
                    norm=self.norm,
                    dtype=self.dtype,
                    name=f"res{stage}_{b}",
                )(x)
            if f"res{stage}" in self.out_features:
                outputs[f"res{stage}"] = x
            bottleneck *= 2
            out_ch *= 2
        return outputs
