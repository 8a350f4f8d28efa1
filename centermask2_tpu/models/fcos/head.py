"""FCOS head: shared cls/bbox towers + predictors, per-level scales.

Rebuilt from reference modeling/fcos/fcos.py:147-240: 4-conv towers with
GN+ReLU, 3x3 predictors for class logits (prior-prob bias init), 4-d box
regression (per-level learnable Scale, then ReLU — "improved FCOS" uses
relu instead of exp, fcos.py:238) and centerness. Tower weights are shared
across FPN levels (applied per level).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from centermask2_tpu.layers import GroupNorm, Scale, normal_init


class Tower(nn.Module):
    """num_convs x [conv3x3(bias) -> GN -> relu]; optionally deformable
    (USE_DEFORMABLE, reference fcos.py:166-186)."""

    num_convs: int
    channels: int
    norm: str = "GN"
    use_deformable: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_convs):
            if self.use_deformable:
                from centermask2_tpu.layers.deform import DeformConvBlock

                x = DeformConvBlock(
                    self.channels, norm="", use_act=False, use_bias=True,
                    dtype=self.dtype, name=f"conv{i}")(x)
            else:
                x = nn.Conv(
                    self.channels, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                    use_bias=True, kernel_init=normal_init(0.01),
                    dtype=self.dtype, param_dtype=jnp.float32, name=f"conv{i}",
                )(x)
            if self.norm == "GN":
                x = GroupNorm(self.channels, num_groups=32, name=f"norm{i}")(x)
            x = jax.nn.relu(x)
        return x


class FCOSHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    num_cls_convs: int = 4
    num_box_convs: int = 4
    num_share_convs: int = 0
    norm: str = "GN"
    num_levels: int = 5
    use_scale: bool = True
    prior_prob: float = 0.01
    use_deformable: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, features: List[jnp.ndarray]
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], List[jnp.ndarray]]:
        """features: per-level (N, Hl, Wl, C). Returns per-level lists
        (logits, bbox_reg, ctrness) in NHWC with C = num_classes / 4 / 1."""
        share_tower = Tower(self.num_share_convs, self.in_channels, self.norm,
                            use_deformable=self.use_deformable,
                            dtype=self.dtype, name="share_tower")
        cls_tower = Tower(self.num_cls_convs, self.in_channels, self.norm,
                          dtype=self.dtype, name="cls_tower")
        bbox_tower = Tower(self.num_box_convs, self.in_channels, self.norm,
                           use_deformable=self.use_deformable,
                           dtype=self.dtype, name="bbox_tower")

        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_logits = nn.Conv(
            self.num_classes, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal_init(0.01),
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype, param_dtype=jnp.float32, name="cls_logits")
        bbox_pred = nn.Conv(
            4, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal_init(0.01),
            dtype=self.dtype, param_dtype=jnp.float32, name="bbox_pred")
        ctrness = nn.Conv(
            1, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal_init(0.01),
            dtype=self.dtype, param_dtype=jnp.float32, name="ctrness")

        logits, bbox_reg, ctr = [], [], []
        for lvl, feature in enumerate(features):
            f = share_tower(feature)
            cls_f = cls_tower(f)
            box_f = bbox_tower(f)
            logits.append(cls_logits(cls_f))
            ctr.append(ctrness(box_f))
            reg = bbox_pred(box_f)
            if self.use_scale:
                reg = Scale(name=f"scale{lvl}")(reg)
            # relu (not exp), as the reference (fcos.py:237-238). From-
            # scratch caveat shared with it: reg gradients exist only at
            # positive locations, so a channel whose pre-activation is
            # <0 at every positive stays relu-dead; with a pretrained
            # backbone (the supported flow) features vary enough that
            # this never happens (see test_overfit_single_image_*).
            bbox_reg.append(jax.nn.relu(reg))
        return logits, bbox_reg, ctr
