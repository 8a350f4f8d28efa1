"""Layer parity vs torch CPU as numerical oracle.

The reference's QA philosophy is golden parity between implementations
(SURVEY.md §4); with detectron2 unavailable, torch.nn.functional provides
the oracle for the primitive ops the reference model is built from.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from centermask2_tpu.layers import (
    Conv2d,
    ConvTranspose2d,
    FrozenBatchNorm,
    GroupNorm,
    Scale,
    SpatialAttention,
    eSEModule,
    hsigmoid,
    max_pool2d_ceil,
)

RTOL, ATOL = 1e-4, 1e-4


def to_nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def from_nhwc(y: jnp.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


@pytest.mark.parametrize("stride,k,pad", [(1, 3, 1), (2, 3, 1), (1, 1, 0), (2, 3, 1)])
def test_conv2d_matches_torch(stride, k, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 13, 11).astype(np.float32)  # odd sizes stress padding
    w = rng.randn(16, 8, k, k).astype(np.float32) * 0.1
    b = rng.randn(16).astype(np.float32) * 0.1

    ref = TF.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                    stride=stride, padding=pad).numpy()

    mod = Conv2d(16, kernel_size=(k, k), strides=(stride, stride), padding=(pad, pad),
                 dtype=jnp.float32)
    params = {"params": {"conv": {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "bias": jnp.asarray(b),
    }}}
    got = from_nhwc(mod.apply(params, to_nhwc(x)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_depthwise_conv_matches_torch():
    rng = np.random.RandomState(1)
    C = 8
    x = rng.randn(1, C, 9, 9).astype(np.float32)
    w = rng.randn(C, 1, 3, 3).astype(np.float32)
    ref = TF.conv2d(torch.from_numpy(x), torch.from_numpy(w), None,
                    padding=1, groups=C).numpy()
    mod = Conv2d(C, kernel_size=(3, 3), padding=(1, 1), groups=C,
                 use_bias=False, dtype=jnp.float32)
    params = {"params": {"conv": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}}}
    got = from_nhwc(mod.apply(params, to_nhwc(x)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_conv_transpose_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 6, 7, 7).astype(np.float32)
    w = rng.randn(6, 4, 2, 2).astype(np.float32)  # torch: (in, out, kh, kw)
    b = rng.randn(4).astype(np.float32)
    ref = TF.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                              torch.from_numpy(b), stride=2).numpy()
    mod = ConvTranspose2d(4, dtype=jnp.float32)
    # kernel layout (kh, kw, out, in): torch (in, out, kh, kw) -> (2, 3, 1, 0)
    params = {"params": {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "bias": jnp.asarray(b),
    }}
    got = from_nhwc(mod.apply(params, to_nhwc(x)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_frozen_bn_matches_torch_bn_eval():
    rng = np.random.RandomState(3)
    C = 12
    x = rng.randn(2, C, 5, 5).astype(np.float32)
    weight = rng.rand(C).astype(np.float32) + 0.5
    bias = rng.randn(C).astype(np.float32)
    mean = rng.randn(C).astype(np.float32)
    var = rng.rand(C).astype(np.float32) + 0.1

    ref = TF.batch_norm(torch.from_numpy(x), torch.from_numpy(mean),
                        torch.from_numpy(var), torch.from_numpy(weight),
                        torch.from_numpy(bias), training=False, eps=1e-5).numpy()

    scale = weight / np.sqrt(var + 1e-5)
    shift = bias - mean * scale
    mod = FrozenBatchNorm(C)
    params = {"params": {"frozen_scale": jnp.asarray(scale), "frozen_bias": jnp.asarray(shift)}}
    got = from_nhwc(mod.apply(params, to_nhwc(x)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_group_norm_matches_torch():
    rng = np.random.RandomState(4)
    C, G = 32, 32
    x = rng.randn(2, C, 6, 6).astype(np.float32)
    weight = rng.rand(C).astype(np.float32) + 0.5
    bias = rng.randn(C).astype(np.float32)
    ref = TF.group_norm(torch.from_numpy(x), G, torch.from_numpy(weight),
                        torch.from_numpy(bias), eps=1e-5).numpy()
    mod = GroupNorm(C, num_groups=G)
    params = {"params": {"gn": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)}}}
    got = from_nhwc(mod.apply(params, to_nhwc(x)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("h,w", [(9, 9), (10, 10), (336, 7)])
def test_max_pool_ceil_matches_torch(h, w):
    rng = np.random.RandomState(5)
    x = rng.randn(1, 3, h, w).astype(np.float32)
    ref = TF.max_pool2d(torch.from_numpy(x), 3, 2, ceil_mode=True).numpy()
    got = from_nhwc(max_pool2d_ceil(to_nhwc(x)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("h,w", [(9, 9), (10, 10), (33, 7)])
def test_max_pool_ceil_gradient_matches_torch(h, w):
    """Pool BACKWARD tie semantics: XLA's select-and-scatter and torch's
    MaxPool2d backward both route each window's cotangent to the FIRST
    maximal element in window order. Random inputs (no ties) and an
    all-ones input (every window one big tie) must produce identical
    gradients. (Round 5 pinned this while evaluating — and rejecting,
    see blocks.py — a custom pool VJP.)"""
    rng = np.random.RandomState(7)
    for x in (rng.randn(1, 3, h, w).astype(np.float32),
              np.ones((1, 3, h, w), np.float32)):
        xt = torch.from_numpy(x).requires_grad_(True)
        TF.max_pool2d(xt, 3, 2, ceil_mode=True).sum().backward()
        gj = jax.grad(lambda a: max_pool2d_ceil(a).sum())(
            jnp.asarray(to_nhwc(x)))
        np.testing.assert_array_equal(
            np.asarray(from_nhwc(gj)), xt.grad.numpy())


def test_hsigmoid_matches_torch():
    x = np.linspace(-5, 5, 31).astype(np.float32)
    ref = (TF.relu6(torch.from_numpy(x) + 3.0) / 6.0).numpy()
    np.testing.assert_allclose(np.asarray(hsigmoid(jnp.asarray(x))), ref, rtol=1e-6)


def test_ese_module_matches_torch_composition():
    rng = np.random.RandomState(6)
    C = 10
    x = rng.randn(2, C, 4, 4).astype(np.float32)
    w = rng.randn(C, C, 1, 1).astype(np.float32) * 0.2
    b = rng.randn(C).astype(np.float32) * 0.1

    xt = torch.from_numpy(x)
    pooled = xt.mean(dim=(2, 3), keepdim=True)
    gate = TF.conv2d(pooled, torch.from_numpy(w), torch.from_numpy(b))
    ref = (xt * (TF.relu6(gate + 3.0) / 6.0)).numpy()

    mod = eSEModule(C, dtype=jnp.float32)
    params = {"params": {"fc": {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "bias": jnp.asarray(b),
    }}}
    got = from_nhwc(mod.apply(params, to_nhwc(x)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_spatial_attention_matches_torch_composition():
    rng = np.random.RandomState(7)
    C = 6
    x = rng.randn(2, C, 5, 5).astype(np.float32)
    w = rng.randn(1, 2, 3, 3).astype(np.float32) * 0.3

    xt = torch.from_numpy(x)
    avg_out = xt.mean(dim=1, keepdim=True)
    max_out = xt.max(dim=1, keepdim=True)[0]
    scale = TF.conv2d(torch.cat([avg_out, max_out], dim=1), torch.from_numpy(w), padding=1)
    ref = (xt * torch.sigmoid(scale)).numpy()

    mod = SpatialAttention(dtype=jnp.float32)
    params = {"params": {"conv": {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
    }}}
    got = from_nhwc(mod.apply(params, to_nhwc(x)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_scale_module():
    mod = Scale(init_value=1.0)
    params = {"params": {"scale": jnp.asarray([2.5])}}
    got = mod.apply(params, jnp.ones((2, 3)))
    np.testing.assert_allclose(np.asarray(got), 2.5 * np.ones((2, 3)), rtol=1e-6)
