"""Core NN building blocks (NHWC, flax.linen).

TPU-native equivalents of the layer vocabulary the reference uses from
torch/detectron2 (reference: centermask2/centermask/modeling/backbone/
vovnet.py:110-260, modeling/centermask/sam.py:12-28, fcos/fcos.py:19-25):

- Conv2d with *torch padding semantics* (explicit symmetric padding, so
  strided convs sample exactly the same taps as torch's padding=N),
- FrozenBatchNorm (inference-style affine; params live under names prefixed
  ``frozen_`` so the optimizer masks them out, matching requires_grad=False),
- GroupNorm(32) as used by the FCOS towers,
- Hsigmoid / eSE channel attention (vovnet.py:238-260),
- SpatialAttention gate of the SAG-Mask head (sam.py:12-28),
- per-level learnable Scale (fcos.py:19-25),
- ceil-mode max pooling (the OSA stage downsampler, vovnet.py:345).

All convs run in NHWC with a configurable compute dtype (bfloat16 by
default for the MXU); parameters stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# detectron2's FrozenBatchNorm2d eps
BN_EPS = 1e-5
GN_EPS = 1e-5

Dtype = Any


def kaiming_normal_fan_out():
    """c2_msra_fill: kaiming normal, fan_out, relu (gain 2)."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def normal_init(std: float):
    return nn.initializers.normal(stddev=std)


class Conv2d(nn.Module):
    """NHWC conv with torch-style integer padding.

    kernel layout is (kh, kw, in/groups, out) — the torch (out, in, kh, kw)
    weights transpose into this at checkpoint conversion.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)  # torch-style (ph, pw), symmetric
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[Dtype] = None  # compute dtype; None = infer from input

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ph, pw = self.padding
        pad = ((ph, ph), (pw, pw))
        y = nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=pad,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        return y


class ConvTranspose2d(nn.Module):
    """Deconv matching torch ConvTranspose2d(k=2, s=2, p=0) semantics
    (the mask-head upsampler, sam.py:74-80)."""

    features: int
    kernel_size: Tuple[int, int] = (2, 2)
    strides: Tuple[int, int] = (2, 2)
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch-gradient semantics: transpose_kernel=True with kernel laid
        # out (kh, kw, out, in) — the torch (in, out, kh, kw) weight
        # transposes via (2, 3, 1, 0).
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, self.features, in_ch), jnp.float32
        )
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_transpose(
            x.astype(dtype),
            kernel.astype(dtype),
            strides=self.strides,
            padding="VALID",
            transpose_kernel=True,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            y = y + bias.astype(dtype)
        return y


class FrozenBatchNorm(nn.Module):
    """Inference-style BN folded to a per-channel affine.

    Conversion folds (weight, bias, running_mean, running_var) into
    (frozen_scale, frozen_bias); the ``frozen_`` prefix is the optimizer
    mask contract (reference freezes BN via requires_grad=False,
    vovnet.py:455-462).
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("frozen_scale", nn.initializers.ones_init(), (self.features,), jnp.float32)
        bias = self.param("frozen_bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        return (x * scale.astype(x.dtype) + bias.astype(x.dtype)).astype(x.dtype)


class GroupNorm(nn.Module):
    features: int
    num_groups: int = 32
    # Keep data in the compute dtype (bf16): flax computes the moments in
    # float32 internally regardless, and staying bf16 halves the HBM
    # traffic of the FCOS towers' 40 GN ops. NOTE: dtype=None would
    # PROMOTE bf16 activations to f32 (f32 scale/bias win the promotion)
    # — measured as the head running at 25% of peak in the r3 roofline.
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=GN_EPS,
            dtype=self.dtype or x.dtype,
            param_dtype=jnp.float32,
            name="gn",
        )(x)


class BatchNorm(nn.Module):
    """Train-capable BatchNorm; SyncBN adds cross-replica batch statistics
    via ``axis_name`` (torch SyncBatchNorm analog).

    Train vs eval is keyed off mutability of the ``batch_stats``
    collection — the train step applies with ``mutable=['batch_stats']``
    (train/trainer.py) — so conv call sites need no train-flag threading.
    Inference (no mutable collections) reads the running averages, and
    the cross-replica psum only engages inside a mapped axis.
    """

    features: int
    axis_name: Optional[str] = None
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        training = (self.is_mutable_collection("batch_stats")
                    and not self.is_initializing())
        return nn.BatchNorm(
            use_running_average=not training,
            momentum=self.momentum,
            epsilon=BN_EPS,
            axis_name=self.axis_name if training else None,
            dtype=None,
            param_dtype=jnp.float32,
            name="bn",
        )(x)


def get_norm(norm: str, features: int, name: str = "norm") -> Optional[nn.Module]:
    """Norm factory mirroring detectron2 get_norm as the reference uses it."""
    if not norm or norm == "none":
        return None
    if norm == "FrozenBN":
        return FrozenBatchNorm(features, name=name)
    if norm == "GN":
        return GroupNorm(features, name=name)
    if norm == "BN":
        return BatchNorm(features, name=name)
    if norm == "SyncBN":
        # cross-replica stats over the DP mesh axis (TPU.MESH_AXIS)
        return BatchNorm(features, axis_name="data", name=name)
    raise ValueError(f"Unknown norm: {norm}")


def hsigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """relu6(x + 3) / 6 (reference Hsigmoid, vovnet.py:238-244)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class _Conv1x1Params(nn.Module):
    """(1, 1, Cin, Cout) conv kernel + bias parameters with nn.Conv's
    default initializers and param names — for modules that keep the
    conv-shaped checkpoint layout but compute with a dense matmul."""

    in_channels: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.in_channels, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k, b


class eSEModule(nn.Module):
    """Effective Squeeze-Excitation: x * hsigmoid(fc(global_avg_pool(x))).

    Reference: vovnet.py:247-260 — a 1x1 conv over the pooled vector, no
    channel reduction.
    """

    channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # (N, H, W, C) -> (N, C); fp32 accumulation without materializing
        # an fp32 copy of the (large) activation. The gate is computed as
        # a dense matmul on the pooled vector rather than a 1x1 conv on a
        # (N, 1, 1, C) tensor: the degenerate-spatial conv triggers XLA
        # layout relayouts around the broadcast multiply at batch > 1
        # (~4.8 ms of pad/copy/slice in OSA2_1 alone at B=4, r2 profile).
        # Parameter stays the conv-shaped (1, 1, C, C) kernel under fc/.
        pooled = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)  # (N, C)
        kernel, bias = _Conv1x1Params(self.channels, self.channels,
                                      name="fc")()
        gate = pooled @ kernel.reshape(self.channels, self.channels) + bias
        return x * hsigmoid(gate)[:, None, None, :].astype(x.dtype)


class SpatialAttention(nn.Module):
    """SAG-Mask spatial attention gate (reference sam.py:12-28):
    x * sigmoid(conv3x3(concat[mean_c(x), max_c(x)]))."""

    kernel_size: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        avg_out = jnp.mean(x, axis=-1, keepdims=True)
        max_out = jnp.max(x, axis=-1, keepdims=True)
        scale = jnp.concatenate([avg_out, max_out], axis=-1)
        p = self.kernel_size // 2
        scale = nn.Conv(
            1,
            kernel_size=(self.kernel_size, self.kernel_size),
            padding=((p, p), (p, p)),
            use_bias=False,
            kernel_init=kaiming_normal_fan_out(),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(scale)
        return x * jax.nn.sigmoid(scale.astype(jnp.float32)).astype(x.dtype)


class Scale(nn.Module):
    """Single learnable scalar multiplier (reference fcos.py:19-25)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, self.init_value, jnp.float32),
            (1,),
        )
        return x * s.astype(x.dtype)


def max_pool2d_ceil(
    x: jnp.ndarray, kernel: int = 3, stride: int = 2
) -> jnp.ndarray:
    """torch MaxPool2d(kernel, stride, ceil_mode=True) on NHWC.

    The OSA stage downsampler (vovnet.py:345). Ceil mode realized by
    -inf padding on bottom/right sized so the last window starts in-bounds.

    NEGATIVE RESULT (round 5, measured on v5e — do not retry): a custom
    VJP that records each window's first-max tap index in the forward
    (argmax over 9 stacked strided views) and replays it as 9 strided
    where-adds in the backward regressed the V-39 train step 57.2 ->
    70.0 ms: XLA materializes the (k^2, N, oh, ow, C) view stack and the
    9 input-sized accumulation buffers instead of fusing a windowed
    pass, adding ~6 ms of unattributed fusions + ~3 ms backbone traffic
    against the 0.68 ms select-and-scatter it was meant to replace.
    XLA's select-and-scatter backward is within ~0.6 ms of anything
    achievable here without a hand-written Pallas windowed kernel.
    """
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - kernel) // stride) + 1
    out_w = -(-(w - kernel) // stride) + 1
    pad_h = max(0, (out_h - 1) * stride + kernel - h)
    pad_w = max(0, (out_w - 1) * stride + kernel - w)
    # -inf (not finfo.min): reduce_window_max only has a reverse-mode rule
    # for the canonical -inf init value
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


class ConvNormAct(nn.Module):
    """conv -> norm -> relu unit, the vocabulary of conv3x3/conv1x1/dw_conv3x3
    (vovnet.py:110-236) and the mask/FCOS tower convs."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    groups: int = 1
    norm: str = "FrozenBN"
    use_act: bool = True
    use_bias: Optional[bool] = None  # default: bias iff no norm
    kernel_init: Callable = kaiming_normal_fan_out()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        use_bias = self.use_bias
        if use_bias is None:
            use_bias = not self.norm
        ph, pw = self.padding
        x = nn.Conv(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=((ph, ph), (pw, pw)),
            feature_group_count=self.groups,
            use_bias=use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        norm = get_norm(self.norm, self.features)
        if norm is not None:
            x = norm(x)
        if self.use_act:
            x = jax.nn.relu(x)
        return x
