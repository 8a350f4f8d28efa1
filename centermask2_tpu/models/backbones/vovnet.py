"""VoVNetV2 backbone (One-Shot Aggregation + eSE), NHWC flax.

Rebuilt from the behavior of the reference implementation
(reference: centermask2/centermask/modeling/backbone/vovnet.py):
- 7 stage specs (vovnet.py:30-108),
- stem of 3 convs at strides 2/1/2 (vovnet.py:432-436),
- OSA modules: input + k sequential 3x3 convs concatenated, 1x1 aggregate,
  eSE gate, identity residual on non-first blocks (vovnet.py:263-332)
  — note the reference applies eSE in *every* OSA module (forward at
  vovnet.py:310-332 ignores the SE flag),
- stages 3-5 open with ceil-mode 3x3/s2 max-pool (vovnet.py:345),
- depthwise variants use dw3x3+pw1x1 with norm only after the pw conv
  (vovnet.py:110-130) and a 1x1 reduction when in!=stage ch
  (vovnet.py:285-290).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from centermask2_tpu.layers import (
    ConvNormAct,
    eSEModule,
    get_norm,
    kaiming_normal_fan_out,
    max_pool2d_ceil,
)
from centermask2_tpu.layers.deform import DeformConvBlock

# Stage specs (reference vovnet.py:30-108).
VoVNet19_slim_dw_eSE = dict(
    stem=[64, 64, 64], stage_conv_ch=[64, 80, 96, 112],
    stage_out_ch=[112, 256, 384, 512], layer_per_block=3,
    block_per_stage=[1, 1, 1, 1], eSE=True, dw=True)
VoVNet19_dw_eSE = dict(
    stem=[64, 64, 64], stage_conv_ch=[128, 160, 192, 224],
    stage_out_ch=[256, 512, 768, 1024], layer_per_block=3,
    block_per_stage=[1, 1, 1, 1], eSE=True, dw=True)
VoVNet19_slim_eSE = dict(
    stem=[64, 64, 128], stage_conv_ch=[64, 80, 96, 112],
    stage_out_ch=[112, 256, 384, 512], layer_per_block=3,
    block_per_stage=[1, 1, 1, 1], eSE=True, dw=False)
VoVNet19_eSE = dict(
    stem=[64, 64, 128], stage_conv_ch=[128, 160, 192, 224],
    stage_out_ch=[256, 512, 768, 1024], layer_per_block=3,
    block_per_stage=[1, 1, 1, 1], eSE=True, dw=False)
VoVNet39_eSE = dict(
    stem=[64, 64, 128], stage_conv_ch=[128, 160, 192, 224],
    stage_out_ch=[256, 512, 768, 1024], layer_per_block=5,
    block_per_stage=[1, 1, 2, 2], eSE=True, dw=False)
VoVNet57_eSE = dict(
    stem=[64, 64, 128], stage_conv_ch=[128, 160, 192, 224],
    stage_out_ch=[256, 512, 768, 1024], layer_per_block=5,
    block_per_stage=[1, 1, 4, 3], eSE=True, dw=False)
VoVNet99_eSE = dict(
    stem=[64, 64, 128], stage_conv_ch=[128, 160, 192, 224],
    stage_out_ch=[256, 512, 768, 1024], layer_per_block=5,
    block_per_stage=[1, 3, 9, 3], eSE=True, dw=False)

STAGE_SPECS = {
    "V-19-slim-dw-eSE": VoVNet19_slim_dw_eSE,
    "V-19-dw-eSE": VoVNet19_dw_eSE,
    "V-19-slim-eSE": VoVNet19_slim_eSE,
    "V-19-eSE": VoVNet19_eSE,
    "V-39-eSE": VoVNet39_eSE,
    "V-57-eSE": VoVNet57_eSE,
    "V-99-eSE": VoVNet99_eSE,
}

# stride of each out feature (vovnet.py:437-438,471-481)
FEATURE_STRIDES = {"stem": 4, "stage2": 4, "stage3": 8, "stage4": 16, "stage5": 32}


def feature_channels(body: str) -> Dict[str, int]:
    spec = STAGE_SPECS[body]
    out = {"stem": spec["stem"][2]}
    for i, c in enumerate(spec["stage_out_ch"]):
        out[f"stage{i + 2}"] = c
    return out


class DWConvBlock(nn.Module):
    """dw3x3 (groups=C, no norm) -> pw1x1 -> norm -> relu
    (reference dw_conv3x3, vovnet.py:110-130)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    norm: str = "FrozenBN"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.features, kernel_size=(3, 3), strides=self.strides,
            padding=((1, 1), (1, 1)), feature_group_count=self.features,
            use_bias=False, kernel_init=kaiming_normal_fan_out(),
            dtype=self.dtype, param_dtype=jnp.float32, name="dw_conv",
        )(x)
        x = nn.Conv(
            self.features, kernel_size=(1, 1), use_bias=False,
            kernel_init=kaiming_normal_fan_out(),
            dtype=self.dtype, param_dtype=jnp.float32, name="pw_conv",
        )(x)
        norm = get_norm(self.norm, self.features, name="pw_norm")
        if norm is not None:
            x = norm(x)
        return jax.nn.relu(x)


class _KernelParam(nn.Module):
    """Bare kernel parameter holder (keeps the stem_1/conv/kernel path for
    checkpoint compatibility while the conv itself is restructured)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_normal_fan_out(), self.shape,
                          jnp.float32)


def regroup_stem1_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, O) conv/s2/pad1 kernel -> the equivalent (2, 2, 4C, O)
    kernel over 2x2 space-to-depth input (zero-pad taps 3->4 at top/left:
    conv(k4, s2, pad 2 top-left) == conv(k3, s2, pad 1), then regroup
    tap d = 2a + p into window position a with phase-p channels)."""
    C, O = kernel.shape[2], kernel.shape[3]
    w4 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = w4.reshape(2, 2, 2, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    return w2.reshape(2, 2, 4 * C, O)


class _AffineParams(nn.Module):
    """FrozenBN affine parameters (same names/paths as FrozenBatchNorm)."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("frozen_scale", nn.initializers.ones_init(),
                       (self.features,), jnp.float32)
        b = self.param("frozen_bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return s, b


class _ConvNormParams(nn.Module):
    """Parameter container with the exact conv/norm paths of ConvNormAct,
    for stem layers whose compute is restructured (s2d_stem_forward)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        k = _KernelParam(self.shape, name="conv")()
        s, b = _AffineParams(self.shape[-1], name="norm")()
        return k, s, b


def _embed_s2d_kernel(w: jnp.ndarray, P: int, Q: int) -> jnp.ndarray:
    """Zero-embed a (3, 3, C, O) stride-1/pad-1 kernel as the (2, 2, 4C, O)
    kernel computing output phase (P, Q) on a 2x2-s2d input.

    Output row 2i+P taps input rows 2i+P+dy-1 (dy in 0..2). Writing that
    row as 2(i+a)+alpha, the window offsets a span {-1,0} for P=0 and
    {0,1} for P=1; the kernel entry at window position a', input phase
    (alpha, beta) is w[dy, dx] with dy = 2(a'+amin)+alpha-P+1 (zero when
    dy/dx falls outside 0..2). Channel blocks are (alpha, beta)-major —
    the (p, q) row-major phase packing stem_1 emits (s2d_stem_forward).
    """
    kh, kw, C, O = w.shape
    K = jnp.zeros((2, 2, 4 * C, O), w.dtype)
    amin = -1 if P == 0 else 0
    bmin = -1 if Q == 0 else 0
    for ap in range(2):
        for bp in range(2):
            for alpha in range(2):
                for beta in range(2):
                    dy = 2 * (ap + amin) + alpha - P + 1
                    dx = 2 * (bp + bmin) + beta - Q + 1
                    if 0 <= dy < kh and 0 <= dx < kw:
                        blk = (alpha * 2 + beta) * C
                        K = K.at[ap, bp, blk:blk + C, :].set(w[dy, dx])
    return K


def _embed_stem1_nat(w1: jnp.ndarray) -> jnp.ndarray:
    """Zero-embed the stem_1 (3, 3, C, O) conv/s2/pad1 kernel as the
    (2, 2, 16C, 4O) kernel computing all four output phases of y1 in one
    2x2/VALID conv over the natural-order factor-4 space-to-depth input
    (data/preprocess.py:stem_space_to_depth — output channel
    rho*4C + kap*C + c holds image pixel (4i + rho - 2, 4j + kap - 2)).

    y1[2i+p, 2j+q] = sum_{dy,dx} w1[dy, dx] * P4[4i + 2p + dy + 1, ...]
    where P4 is the image padded by 2 on every side; the conv window
    position a and input row-phase rho satisfy 4a + rho = 2p + dy + 1
    (and likewise for columns), so every tap lands in a unique
    (window, phase) slot. Output phases are packed (p, q) row-major
    along channels — the block order _embed_s2d_kernel expects.
    """
    kh, kw, C, O = w1.shape
    K = jnp.zeros((2, 2, 16 * C, 4 * O), w1.dtype)
    for p in (0, 1):
        for q in (0, 1):
            for dy in range(kh):
                for dx in range(kw):
                    a, rho = divmod(2 * p + dy + 1, 4)
                    b, kap = divmod(2 * q + dx + 1, 4)
                    blk = (rho * 4 + kap) * C
                    out = (p * 2 + q) * O
                    K = K.at[a, b, blk:blk + C, out:out + O].set(w1[dy, dx])
    return K


def _conv2x2_valid(x: jnp.ndarray, k: jnp.ndarray, dtype) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d_stem_forward(xd2, k1, k2, k3, dtype) -> jnp.ndarray:
    """The full VoVNet stem evaluated in space-to-depth coordinates.

    Rationale: at 1344 input the reference stem (conv3x3/s2 on 3 channels
    -> conv3x3 on 64 -> conv3x3/s2 to 128; reference vovnet.py:432-436)
    profiles at ~2.4 ms on TPU — the 3-channel conv wastes the 128-lane
    MXU and the 64-channel/672^2 intermediates trigger ~0.9 ms of XLA
    layout copies. Evaluated on the host's double-s2d input
    (B, H/4+1, W/4+1, 48), every tensor in the stem lives at stride-4
    spatial size with 48-256 channels and all three convs become 2x2
    convs with zero-embedded kernels (exact math, ~16/9 redundant FLOPs
    on stem_2/3, still ~4x faster end to end). Output equals the plain
    stem bit-for-bit up to f32/bf16 rounding; parameters are the logical
    (3, 3, Cin, Cout) kernels, so checkpoints convert unchanged.

    xd2: (B, Hd, Wd, 48) from stem_space_to_depth; k1/k2/k3:
    (kernel, frozen_scale, frozen_bias) tuples. Returns the stem output
    (B, Hd-1, Wd-1, C3) in plain NHWC layout.

    Kernel packing (r2 profile: 4 separate O=64 phase convs cap at 50%
    MXU lane utilization and the two phase concats cost ~0.35 ms):
    - stem_1: all 4 phases in ONE conv — phase kernels concatenated
      along the output axis, producing y1d directly (no concat op).
    - stem_2: phases paired over Q — the Q=0/Q=1 window columns differ
      by one, so both fit a (2, 3) kernel with each phase's 2x2 kernel
      zero-embedded at column offset Q; two convs with 2*C2 = 128
      output channels run at full lane width.
    - stem_3: its (2, 2, 4*C2, C3) kernel is split channel-wise across
      the two stem_2 pair outputs and summed, so y2d is never
      materialized as a concat either.
    """
    w1, s1, b1 = k1
    w2, s2, b2 = k2
    w3, s3, b3 = k3

    def affine_relu(y, s, b, rep):
        s = jnp.tile(s, rep).astype(y.dtype)
        b = jnp.tile(b, rep).astype(y.dtype)
        return jax.nn.relu(y * s + b)

    # stem_1: 4 output phases of y1 (the conv3x3/s2/p1 on the image),
    # computed straight from the natural-order s2d input in ONE conv,
    # packed (p, q) row-major along channels = the s2d block order
    # _embed_s2d_kernel expects downstream
    k1all = _embed_stem1_nat(w1)  # (2, 2, 48, 4*C1)
    y1d = affine_relu(_conv2x2_valid(xd2, k1all, dtype), s1, b1, 4)

    # stem_2: conv3x3/s1/p1 in s2d space — 2 paired phase convs over the
    # 1-padded y1d (zero rows/cols of y1d are exactly y1's conv padding)
    y1p = jnp.pad(y1d, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = y1d.shape[1], y1d.shape[2]
    C1x4, C2 = y1p.shape[-1], w2.shape[-1]
    y2_pairs = []
    for P in (0, 1):
        kp = jnp.zeros((2, 3, C1x4, 2 * C2), w2.dtype)
        for Q in (0, 1):
            kq = _embed_s2d_kernel(w2, P, Q)  # (2, 2, 4*C1, C2)
            kp = kp.at[:, Q:Q + 2, :, Q * C2:(Q + 1) * C2].set(kq)
        y2_pairs.append(affine_relu(
            _conv2x2_valid(y1p[:, P:P + h + 1, :, :], kp, dtype), s2, b2, 2))

    # stem_3: conv3x3/s2/p1 — its stride-2 output lands exactly on the
    # s2d grid: one phase-(0,0) conv, evaluated as two channel-half
    # convs over the (top/left zero-padded) stem_2 pairs and summed
    k3 = _embed_s2d_kernel(w3, 0, 0)  # (2, 2, 4*C2, C3)
    y3 = None
    for P in (0, 1):
        yp = jnp.pad(y2_pairs[P], ((0, 0), (1, 0), (1, 0), (0, 0)))
        part = _conv2x2_valid(yp, k3[:, :, 2 * P * C2:2 * (P + 1) * C2, :],
                              dtype)
        y3 = part if y3 is None else y3 + part
    return affine_relu(y3, s3, b3, 1)


class S2DStemConv(nn.Module):
    """stem_1 as a space-to-depth conv — exact math rewrite.

    The reference stem_1 (conv 3x3/s2 on the 3-channel image,
    vovnet.py:432) is pathological on the MXU: 3 input channels use 2% of
    the 128-lane systolic array, and the profiler shows it plus its layout
    copies costing ~1.6 ms at 1344 input. The identical operator expressed
    on space-to-depth-transformed input (2x2 blocks -> 12 channels,
    kernel zero-padded 3->4 then regrouped to 2x2x12) keeps the exact
    output while quadrupling MXU lane utilization. The parameter is still
    the logical (3, 3, 3, C) kernel, so checkpoints convert unchanged.

    (For the host-side space-to-depth input path, see s2d_stem_forward.)
    """

    features: int
    norm: str = "FrozenBN"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        kernel = _KernelParam((3, 3, C, self.features), name="conv")()
        dtype = self.dtype or x.dtype
        w2 = regroup_stem1_kernel(kernel)
        # space-to-depth the (top/left zero-padded) image via strided
        # slices (a transpose+reshape lowers to a ~2 ms relayout copy)
        xp = jnp.pad(x, ((0, 0), (2, 0), (2, 0), (0, 0)))
        xd = jnp.concatenate(
            [xp[:, 0::2, 0::2, :], xp[:, 0::2, 1::2, :],
             xp[:, 1::2, 0::2, :], xp[:, 1::2, 1::2, :]], axis=-1)
        y = jax.lax.conv_general_dilated(
            xd.astype(dtype), w2.astype(dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        norm = get_norm(self.norm, self.features, name="norm")
        if norm is not None:
            y = norm(y)
        return jax.nn.relu(y)


class OSAModule(nn.Module):
    """One-Shot-Aggregation block (reference _OSA_module, vovnet.py:263-332)."""

    stage_ch: int
    concat_ch: int
    layer_per_block: int
    identity: bool = False
    depthwise: bool = False
    with_dcn: bool = False
    with_modulated_dcn: bool = False
    deformable_groups: int = 1
    norm: str = "FrozenBN"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity_feat = x
        outputs = [x]
        in_ch = x.shape[-1]
        if self.depthwise and in_ch != self.stage_ch:
            x = ConvNormAct(
                self.stage_ch, kernel_size=(1, 1), padding=(0, 0),
                norm=self.norm, dtype=self.dtype, name="reduction",
            )(x)
        for i in range(self.layer_per_block):
            if self.depthwise:
                x = DWConvBlock(
                    self.stage_ch, norm=self.norm, dtype=self.dtype,
                    name=f"layer{i}",
                )(x)
            elif self.with_dcn:
                # DFConv3x3 (reference vovnet.py:132-201)
                x = DeformConvBlock(
                    self.stage_ch, modulated=self.with_modulated_dcn,
                    deformable_groups=self.deformable_groups,
                    norm=self.norm, dtype=self.dtype, name=f"layer{i}",
                )(x)
            else:
                x = ConvNormAct(
                    self.stage_ch, kernel_size=(3, 3), padding=(1, 1),
                    norm=self.norm, dtype=self.dtype, name=f"layer{i}",
                )(x)
            outputs.append(x)

        # NOTE(perf): a "segment-wise aggregation" rewrite (sum of
        # per-segment 1x1 matmuls instead of concat + one conv) was
        # measured SLOWER (1.8 ms vs 0.4 ms for OSA2_1 at 1344): XLA
        # materializes each f32 partial product, while the concat layout
        # lets every layer conv write straight into its slice of the
        # concat buffer (the DUS fusions in the profile) — already
        # optimal HBM traffic. A second rewrite (zero-padding each
        # concat segment to the 128-lane boundary + zero-embedded agg
        # kernel rows, to kill the lane-shift copies on the misaligned
        # 160/192/224-ch stages) also measured SLOWER end to end
        # (8.25 -> 8.55 ms/img): the +45% agg-conv FLOPs on the padded
        # input outweigh the ~0.3 ms of relayout copies it saves.
        x = jnp.concatenate(outputs, axis=-1)
        xt = ConvNormAct(
            self.concat_ch, kernel_size=(1, 1), padding=(0, 0),
            norm=self.norm, dtype=self.dtype, name="concat",
        )(x)
        # eSE is unconditional in the reference forward (vovnet.py:326).
        xt = eSEModule(self.concat_ch, dtype=self.dtype, name="ese")(xt)
        if self.identity:
            xt = xt + identity_feat
        return xt


class VoVNet(nn.Module):
    """VoVNetV2 trunk. Returns a dict of the requested out_features."""

    body: str = "V-39-eSE"
    out_features: Sequence[str] = ("stage2", "stage3", "stage4", "stage5")
    norm: str = "FrozenBN"
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    with_modulated_dcn: bool = False
    deformable_groups: int = 1
    # Off by default: on the current XLA/TPU stack the s2d input
    # transform lowers to a reshape+copy (~3 ms at 1344) that costs
    # more than the small-channel conv it replaces.
    space_to_depth_stem: bool = False
    # Input is double space-to-depth'd on the host (B, H/4+1, W/4+1, 48;
    # data/preprocess.py:stem_space_to_depth); the whole stem evaluates in
    # s2d coordinates (s2d_stem_forward) with no device-side relayout.
    # Non-depthwise variants only.
    s2d_input: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        spec = STAGE_SPECS[self.body]
        stem_ch = spec["stem"]
        depthwise = spec["dw"]

        # Stem: conv3x3/s2, conv/s1, conv/s2 (vovnet.py:432-436). The first
        # stem conv is always a standard conv even in dw variants.
        if self.s2d_input:
            assert not depthwise, "s2d stem supports standard convs only"
            assert self.norm == "FrozenBN", self.norm
            k1 = _ConvNormParams((3, 3, x.shape[-1] // 16, stem_ch[0]),
                                 name="stem_1")()
            k2 = _ConvNormParams((3, 3, stem_ch[0], stem_ch[1]),
                                 name="stem_2")()
            k3 = _ConvNormParams((3, 3, stem_ch[1], stem_ch[2]),
                                 name="stem_3")()
            x = s2d_stem_forward(x, k1, k2, k3, self.dtype or x.dtype)
        else:
            if self.space_to_depth_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                x = S2DStemConv(stem_ch[0], norm=self.norm, dtype=self.dtype,
                                name="stem_1")(x)
            else:
                x = ConvNormAct(stem_ch[0], strides=(2, 2), norm=self.norm,
                                dtype=self.dtype, name="stem_1")(x)
            if depthwise:
                x = DWConvBlock(stem_ch[1], norm=self.norm, dtype=self.dtype,
                                name="stem_2")(x)
                x = DWConvBlock(stem_ch[2], strides=(2, 2), norm=self.norm,
                                dtype=self.dtype, name="stem_3")(x)
            else:
                x = ConvNormAct(stem_ch[1], norm=self.norm, dtype=self.dtype,
                                name="stem_2")(x)
                x = ConvNormAct(stem_ch[2], strides=(2, 2), norm=self.norm,
                                dtype=self.dtype, name="stem_3")(x)

        outputs: Dict[str, jnp.ndarray] = {}
        if "stem" in self.out_features:
            outputs["stem"] = x

        for i in range(4):
            stage_num = i + 2
            if stage_num != 2:
                x = max_pool2d_ceil(x, kernel=3, stride=2)
            blocks = spec["block_per_stage"][i]
            for b in range(blocks):
                x = OSAModule(
                    stage_ch=spec["stage_conv_ch"][i],
                    concat_ch=spec["stage_out_ch"][i],
                    layer_per_block=spec["layer_per_block"],
                    identity=(b > 0),
                    depthwise=depthwise,
                    with_dcn=bool(self.stage_with_dcn[i]),
                    with_modulated_dcn=self.with_modulated_dcn,
                    deformable_groups=self.deformable_groups,
                    norm=self.norm,
                    dtype=self.dtype,
                    name=f"OSA{stage_num}_{b + 1}",
                )(x)
            name = f"stage{stage_num}"
            if name in self.out_features:
                outputs[name] = x
        return outputs
