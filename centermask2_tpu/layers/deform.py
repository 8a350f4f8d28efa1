"""Deformable conv blocks (the DFConv3x3 / DFConv2d module analogs).

Reference: vovnet.py:132-201 (DFConv3x3: zero-init offset conv ->
DeformConv/ModulatedDeformConv -> norm -> relu) and
layers/deform_conv.py:19-112 (DFConv2d for the FCOS towers). Offsets are
predicted by a regular 3x3 conv initialized to zero, so an untrained
block equals a plain conv.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from centermask2_tpu.ops.deform_conv import deform_conv2d
from .blocks import get_norm, kaiming_normal_fan_out


class DeformConvBlock(nn.Module):
    """3x3 deformable conv with optional modulation (DCNv2), norm, relu."""

    features: int
    modulated: bool = False
    deformable_groups: int = 1  # groups > 1 share our single offset field
    norm: str = "FrozenBN"
    use_act: bool = True
    use_bias: bool = False
    dilation: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        K = 9
        off_ch = (3 if self.modulated else 2) * K * self.deformable_groups
        raw = nn.Conv(
            off_ch, kernel_size=(3, 3),
            padding=((self.dilation,) * 2, (self.dilation,) * 2),
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=nn.initializers.zeros_init(),
            bias_init=nn.initializers.zeros_init(),
            dtype=jnp.float32, param_dtype=jnp.float32, name="conv_offset",
        )(x.astype(jnp.float32))
        if self.modulated:
            # reference DFConv3x3 chunks into (off_x, off_y, mask)
            off_x, off_y, m = jnp.split(raw, 3, axis=-1)
            offsets = jnp.stack([off_y, off_x], axis=-1).reshape(
                *raw.shape[:3], 2 * K)
            mask = jax.nn.sigmoid(m)
        else:
            offsets = raw
            mask = None

        kernel = self.param(
            "kernel", kaiming_normal_fan_out(),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        y = deform_conv2d(x, offsets, kernel, mask, bias,
                          padding=self.dilation, dilation=self.dilation)
        norm = get_norm(self.norm, self.features)
        if norm is not None:
            y = norm(y)
        if self.use_act:
            y = jax.nn.relu(y)
        return y
