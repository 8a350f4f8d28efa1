"""Feature Pyramid Network, built from scratch for NHWC/XLA.

The reference imports detectron2's FPN (vovnet.py:10); this is a
from-scratch implementation of the same topology: 1x1 laterals,
nearest-2x top-down fusion, 3x3 output convs, and the FCOS top blocks
LastLevelP6P7 / LastLevelP6 (reference: modeling/backbone/fpn.py:17-53)
or LastLevelMaxPool (detectron2).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from centermask2_tpu.layers import get_norm


def _xavier_fill():
    """c2_xavier_fill: uniform with gain based on fan_in."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, 2H, 2W, C) exact nearest (== F.interpolate x2)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class FPN(nn.Module):
    """Top-down FPN over bottom-up features ordered low->high stride.

    in_strides: strides of the input features (e.g. [8, 16, 32] for
    stage3..stage5). Output dict maps "p{log2(stride)}" to maps, plus the
    top block's extra levels.
    """

    in_strides: Sequence[int]
    out_channels: int = 256
    norm: str = ""
    fuse_type: str = "sum"
    top_block: Optional[str] = "p6p7"  # "p6p7" | "p6" | "maxpool" | None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        assert len(feats) == len(self.in_strides)
        import math

        stages = [int(math.log2(s)) for s in self.in_strides]
        use_bias = self.norm == ""

        def lateral(x, stage):
            y = nn.Conv(
                self.out_channels, kernel_size=(1, 1), use_bias=use_bias,
                kernel_init=_xavier_fill(), dtype=self.dtype,
                param_dtype=jnp.float32, name=f"fpn_lateral{stage}",
            )(x)
            norm = get_norm(self.norm, self.out_channels, name=f"fpn_lateral{stage}_norm")
            return norm(y) if norm is not None else y

        def output(x, stage):
            y = nn.Conv(
                self.out_channels, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                use_bias=use_bias, kernel_init=_xavier_fill(), dtype=self.dtype,
                param_dtype=jnp.float32, name=f"fpn_output{stage}",
            )(x)
            norm = get_norm(self.norm, self.out_channels, name=f"fpn_output{stage}_norm")
            return norm(y) if norm is not None else y

        results: Dict[str, jnp.ndarray] = {}
        # top-down pass (deepest first), mirroring detectron2 FPN.forward
        prev = lateral(feats[-1], stages[-1])
        results[f"p{stages[-1]}"] = output(prev, stages[-1])
        for idx in range(len(feats) - 2, -1, -1):
            stage = stages[idx]
            lat = lateral(feats[idx], stage)
            td = upsample_nearest_2x(prev)
            td = td[:, : lat.shape[1], : lat.shape[2], :]
            prev = lat + td
            if self.fuse_type == "avg":
                prev = prev / 2.0
            results[f"p{stage}"] = output(prev, stage)

        top_stage = stages[-1]
        p_top = results[f"p{top_stage}"]
        if self.top_block == "p6p7":
            # LastLevelP6P7 on P5 (reference fpn.py:17-35)
            p6 = nn.Conv(
                self.out_channels, kernel_size=(3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), kernel_init=_xavier_fill(),
                dtype=self.dtype, param_dtype=jnp.float32, name="top_block_p6",
            )(p_top)
            p7 = nn.Conv(
                self.out_channels, kernel_size=(3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), kernel_init=_xavier_fill(),
                dtype=self.dtype, param_dtype=jnp.float32, name="top_block_p7",
            )(jax.nn.relu(p6))
            results[f"p{top_stage + 1}"] = p6
            results[f"p{top_stage + 2}"] = p7
        elif self.top_block == "p6":
            p6 = nn.Conv(
                self.out_channels, kernel_size=(3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), kernel_init=_xavier_fill(),
                dtype=self.dtype, param_dtype=jnp.float32, name="top_block_p6",
            )(p_top)
            results[f"p{top_stage + 1}"] = p6
        elif self.top_block == "maxpool":
            # LastLevelMaxPool: k=1, s=2 subsample
            results[f"p{top_stage + 1}"] = p_top[:, ::2, ::2, :]
        return results
