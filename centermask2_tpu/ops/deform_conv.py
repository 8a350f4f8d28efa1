"""Deformable convolution v1/v2 as an XLA gather + matmul op.

TPU-native replacement for detectron2's DeformConv / ModulatedDeformConv
CUDA kernels (reference call sites: vovnet.py:132-201 DFConv3x3 with
STAGE_WITH_DCN, layers/deform_conv.py:19-112 DFConv2d for the FCOS
towers; both config-gated off in shipped configs).

Per output pixel p and kernel tap k the input is sampled at
p + k + offset[p, k] with bilinear interpolation (zero outside), then the
taps contract with the kernel on the MXU: out = einsum(samples, W).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def deform_conv2d(
    x: jnp.ndarray,  # (N, H, W, C)
    offsets: jnp.ndarray,  # (N, H, W, 2*kh*kw) as (dy, dx) pairs per tap
    weight: jnp.ndarray,  # (kh, kw, C, O)
    mask: Optional[jnp.ndarray] = None,  # (N, H, W, kh*kw) modulation
    bias: Optional[jnp.ndarray] = None,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Stride-1 deformable conv (the reference only uses stride 1)."""
    N, H, W, C = x.shape
    kh, kw, _, O = weight.shape
    K = kh * kw

    off = offsets.reshape(N, H, W, K, 2)
    # base sampling positions: output pixel + dilated tap - padding
    ky = (jnp.arange(kh, dtype=jnp.float32) * dilation)[:, None]
    kx = (jnp.arange(kw, dtype=jnp.float32) * dilation)[None, :]
    base_y = jnp.broadcast_to(ky, (kh, kw)).reshape(K)
    base_x = jnp.broadcast_to(kx, (kh, kw)).reshape(K)
    py = jnp.arange(H, dtype=jnp.float32)[:, None, None] + base_y - padding
    px = jnp.arange(W, dtype=jnp.float32)[None, :, None] + base_x - padding
    ys = py[None] + off[..., 0]  # (N, H, W, K)
    xs = px[None] + off[..., 1]

    # bilinear with zero padding outside
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    out = jnp.zeros((N, H, W, K, C), jnp.float32)
    flat = x.reshape(N, H * W, C).astype(jnp.float32)

    for dy, wy in ((0, 1 - ly), (1, ly)):
        for dx, wx in ((0, 1 - lx), (1, lx)):
            yy = y0 + dy
            xx = x0 + dx
            inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            idx = (jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)).astype(jnp.int32)
            g = jnp.take_along_axis(
                flat[:, :, None, :],
                idx.reshape(N, -1, 1, 1),
                axis=1,
            ).reshape(N, H, W, K, C)
            w = (wy * wx * inb).astype(jnp.float32)
            out = out + g * w[..., None]

    if mask is not None:
        out = out * mask[..., None].astype(out.dtype)

    y = jnp.einsum("nhwkc,kco->nhwo", out,
                   weight.reshape(K, C, O).astype(jnp.float32))
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)
