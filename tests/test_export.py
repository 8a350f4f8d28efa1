import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centermask2_tpu.models import CenterMask


@pytest.fixture(scope="module")
def tiny():
    model = CenterMask(
        conv_body="V-19-slim-eSE", post_nms_topk_test=5, pre_nms_topk_test=20,
        nms_candidates=20, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_aot_roundtrip(tiny, tmp_path):
    from centermask2_tpu.export import export_serialized, load_serialized

    model, variables, x = tiny
    path = str(tmp_path / "model.jaxir")
    export_serialized(model, variables, (1, 64, 64, 3), path)
    assert os.path.getsize(path) > 1000

    fn = load_serialized(path)
    rng = np.random.RandomState(0)
    xin = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 20)
    out_direct = model.apply(variables, xin)
    out_loaded = fn(xin)
    # same 6-tensor contract, numerically identical
    np.testing.assert_allclose(np.asarray(out_direct.scores),
                               np.asarray(out_loaded[5]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_direct.pred_boxes),
                               np.asarray(out_loaded[2]), rtol=1e-5, atol=1e-4)


def test_measures(tiny):
    from centermask2_tpu.utils import count_params, summarize

    model, variables, x = tiny
    n = count_params(variables["params"])
    assert n > 1e5

    def fn(v, images):
        return model.apply(v, images)

    stats = summarize(fn, variables, x)
    assert stats["flops"] > 1e8  # conv-dominated forward
    assert stats["params"] == n


def test_aot_roundtrip_serving_u8_tight(tmp_path):
    """The uint8 TIGHT-pack serving program (input_dtype=uint8 +
    canvas_hw) must serialize, reload, and reproduce the direct path."""
    from centermask2_tpu.data.preprocess import s2d_pack_u8_tight, s2d_preprocess
    from centermask2_tpu.export import export_serialized, load_serialized

    model = CenterMask(
        conv_body="V-19-slim-eSE", post_nms_topk_test=5, pre_nms_topk_test=20,
        nms_candidates=20, dtype=jnp.float32, s2d_input=True)
    x0 = jnp.zeros((1, 17, 17, 48), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)

    rng = np.random.RandomState(1)
    img = (rng.rand(40, 61, 3) * 255).astype(np.uint8)
    xt = jnp.asarray(s2d_pack_u8_tight(img, 64, multiple=8))
    hw = jnp.asarray([[40, 61]], jnp.int32)

    path = str(tmp_path / "serving.jaxir")
    export_serialized(model, variables, tuple(xt.shape), path,
                      input_dtype=jnp.uint8, canvas_hw=(64, 64))
    fn = load_serialized(path)
    out_loaded = fn(xt, hw)
    out_direct = model.apply(variables, jnp.asarray(s2d_preprocess(img, 64)))
    np.testing.assert_allclose(np.asarray(out_direct.scores),
                               np.asarray(out_loaded[5]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_direct.pred_boxes),
                               np.asarray(out_loaded[2]), rtol=1e-5, atol=1e-4)


def test_aot_roundtrip_serving_u8_tight_compute(tmp_path):
    """The tight-COMPUTE serving program (runs AT the rect canvas, no
    on-device pad-back — export_model.py --tight --tight-compute) must
    serialize, reload, and reproduce the direct rect-canvas f32 path
    bit-for-bit (u8 on-device normalization is exact)."""
    from centermask2_tpu.data.preprocess import (PIXEL_MEAN, s2d_pack_u8,
                                                 stem_space_to_depth)
    from centermask2_tpu.export import export_serialized, load_serialized

    model = CenterMask(
        conv_body="V-19-slim-eSE", post_nms_topk_test=5, pre_nms_topk_test=20,
        nms_candidates=20, dtype=jnp.float32, s2d_input=True)
    rng = np.random.RandomState(1)
    img = (rng.rand(30, 61, 3) * 255).astype(np.uint8)
    # rect canvas (32, 64): covers the image, /32 (the d2
    # size_divisibility — FPN top-down requires it), not the 64-square
    xu = jnp.asarray(s2d_pack_u8(img, (32, 64)))
    hw = jnp.asarray([[30, 61]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(xu.shape, jnp.float32))

    path = str(tmp_path / "serving_tc.jaxir")
    export_serialized(model, variables, tuple(xu.shape), path,
                      input_dtype=jnp.uint8, canvas_hw=None)
    fn = load_serialized(path)
    out_loaded = fn(xu, hw)

    canvas = np.zeros((32, 64, 3), np.float32)
    canvas[:30, :61] = img.astype(np.float32) - np.asarray(
        PIXEL_MEAN, np.float32)
    out_direct = model.apply(variables,
                             jnp.asarray(stem_space_to_depth(canvas[None])))
    np.testing.assert_allclose(np.asarray(out_direct.scores),
                               np.asarray(out_loaded[5]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_direct.pred_boxes),
                               np.asarray(out_loaded[2]), rtol=1e-5, atol=1e-4)
