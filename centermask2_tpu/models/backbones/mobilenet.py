"""MobileNetV2 backbone (NHWC flax), inverted residuals + frozen BN.

Rebuilt from the behavior of the reference
(reference: centermask2/centermask/modeling/backbone/mobilenet.py:38-145):
conv_bn stem, 17 InvertedResidual blocks with ReLU6, feature taps after
blocks 3/6/13/17 -> res2..res5 (strides 4/8/16/32, channels 24/32/96/320).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from centermask2_tpu.layers import FrozenBatchNorm

# (expand_ratio t, out_channels c, repeats n, stride s) — mobilenet.py:90-98
INVERTED_RESIDUAL_SETTING = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]
RETURN_FEATURES_INDICES = [3, 6, 13, 17]
FEATURE_CHANNELS = {"res2": 24, "res3": 32, "res4": 96, "res5": 320}
FEATURE_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _conv(features, k, s, groups=1, name=None):
    p = (k - 1) // 2
    return nn.Conv(
        features, kernel_size=(k, k), strides=(s, s),
        padding=((p, p), (p, p)), feature_group_count=groups,
        use_bias=False, param_dtype=jnp.float32, name=name,
    )


class InvertedResidual(nn.Module):
    """mobilenet.py:38-76."""

    oup: int
    stride: int
    expand_ratio: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        use_res = self.stride == 1 and inp == self.oup
        y = x
        i = 0
        if self.expand_ratio != 1:
            y = _conv(hidden, 1, 1, name=f"conv{i}")(y)
            y = FrozenBatchNorm(hidden, name=f"bn{i}")(y)
            y = relu6(y)
            i += 1
        y = _conv(hidden, 3, self.stride, groups=hidden, name=f"conv{i}")(y)
        y = FrozenBatchNorm(hidden, name=f"bn{i}")(y)
        y = relu6(y)
        i += 1
        y = _conv(self.oup, 1, 1, name=f"conv{i}")(y)
        y = FrozenBatchNorm(self.oup, name=f"bn{i}")(y)
        return x + y if use_res else y


class MobileNetV2(nn.Module):
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    width_mult: float = 1.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        input_channel = int(32 * self.width_mult)
        x = _conv(input_channel, 3, 2, name="features0_conv")(x)
        x = FrozenBatchNorm(input_channel, name="features0_bn")(x)
        x = relu6(x)

        outputs: Dict[str, jnp.ndarray] = {}
        idx = 0  # features[0] was the stem
        res_i = 2
        for t, c, n, s in INVERTED_RESIDUAL_SETTING:
            oc = int(c * self.width_mult)
            for i in range(n):
                idx += 1
                x = InvertedResidual(
                    oup=oc, stride=s if i == 0 else 1, expand_ratio=t,
                    dtype=self.dtype, name=f"features{idx}",
                )(x)
                if idx in RETURN_FEATURES_INDICES:
                    name = f"res{res_i}"
                    if name in self.out_features:
                        outputs[name] = x
                    res_i += 1
        return outputs
