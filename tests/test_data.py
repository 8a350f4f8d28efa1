import os
import tempfile

import numpy as np

from centermask2_tpu.data import (
    FIXED_EDGE_SIZE,
    bin_io,
    compute_resize_shape,
    detector_postprocess,
    paste_masks_np,
    postprocess_scale,
    resize_shortest_edge,
    single_preprocessing,
    single_wrap_outputs,
)


def test_compute_resize_shape():
    # shortest edge -> 800; max edge capped at 1333
    assert compute_resize_shape(480, 640) == (800, 1067)
    assert compute_resize_shape(640, 480) == (1067, 800)
    assert compute_resize_shape(500, 1000) == (667, 1333)
    assert compute_resize_shape(800, 800) == (800, 800)
    # COCO canonical image 000000000139.jpg is 426x640 -> (800, 1202)
    assert compute_resize_shape(426, 640) == (800, 1202)


def test_resize_matches_pil_directly():
    from PIL import Image

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (100, 150, 3), np.uint8)
    out = resize_shortest_edge(img, short=50, max_size=100)
    # 100x150 -> short 50 => (50, 75)
    assert out.shape == (50, 75, 3)
    ref = np.asarray(Image.fromarray(img).resize((75, 50), Image.BILINEAR))
    np.testing.assert_array_equal(out, ref)


def test_single_preprocessing_contract():
    img = np.full((800, 1202, 3), 128.0, np.float32)
    out = single_preprocessing(img)
    assert out.shape == (FIXED_EDGE_SIZE, FIXED_EDGE_SIZE, 3)
    np.testing.assert_allclose(out[0, 0], [128 - 103.53, 128 - 116.28, 128 - 123.675],
                               rtol=1e-5)
    assert np.all(out[800:] == 0) and np.all(out[:, 1202:] == 0)


def test_postprocess_scale():
    # matches deploy_utils.py:138-144 math
    assert abs(postprocess_scale(426, 640) - 800 / 426) < 1e-9
    s = postprocess_scale(500, 1000)
    assert abs(s - (1333 / 1600) * 1.6) < 1e-9


def test_bin_roundtrip():
    rng = np.random.RandomState(1)
    img = rng.randn(1344, 1344, 3).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.bin")
        bin_io.write_input_bin(img, path)
        # byte layout: NCHW float32 (reference to_bin)
        raw = np.fromfile(path, np.float32)
        assert raw.size == 3 * 1344 * 1344
        back = bin_io.read_input_bin(path)
        np.testing.assert_array_equal(back, img)

        outs = [
            rng.randn(50, 2).astype(np.float32),
            rng.rand(50).astype(np.float32),
            rng.rand(50, 4).astype(np.float32) * 100,
            rng.randint(0, 80, 50).astype(np.int64),
            rng.rand(50, 1, 28, 28).astype(np.float32),
            rng.rand(50).astype(np.float32),
        ]
        prefix = os.path.join(d, "0001")
        bin_io.write_output_bins(outs, prefix)
        back = bin_io.read_output_bins(prefix)
        for a, b in zip(outs, back):
            np.testing.assert_array_equal(a, b.reshape(a.shape))
        assert bin_io.read_output_bins(os.path.join(d, "missing")) is None


def test_detector_postprocess():
    rng = np.random.RandomState(2)
    n = 5
    results = single_wrap_outputs([
        rng.rand(n, 2).astype(np.float32),
        rng.rand(n).astype(np.float32),
        np.array([[10, 10, 100, 100], [0, 0, 0, 0], [50, 50, 200, 220],
                  [700, 700, 790, 795], [5, 5, 6, 6]], np.float32),
        np.arange(n, dtype=np.int64),
        rng.rand(n, 1, 28, 28).astype(np.float32),
        np.linspace(0.9, 0.5, n).astype(np.float32),
    ])
    h, w = 426, 640  # original size; scale = 800/426
    out = detector_postprocess(results, h, w)
    scale = 800 / 426
    # box 0 rescaled by 1/scale
    np.testing.assert_allclose(out["pred_boxes"][0], np.array([10, 10, 100, 100]) / scale,
                               rtol=1e-5)
    # empty box dropped
    assert len(out["pred_boxes"]) == 4
    assert out["pred_masks"].shape == (4, h, w)
    assert out["pred_masks"].dtype == bool


def test_paste_masks_np_footprint():
    masks = np.ones((1, 28, 28), np.float32)
    out = paste_masks_np(masks, np.array([[10.0, 10.0, 20.0, 20.0]]), (30, 30))
    assert out[0, 15, 15]
    assert not out[0, 5, 5]
    assert not out[0, 25, 25]


def test_bucketing():
    from centermask2_tpu.data.bucketing import (
        batches_from_groups,
        group_by_bucket,
        pick_bucket,
    )

    assert pick_bucket(800, 1202, [896, 1120, 1344]) == 1344
    assert pick_bucket(800, 1067, [896, 1120, 1344]) == 1120
    assert pick_bucket(800, 800, [896, 1120, 1344]) == 896
    # too large: falls back to largest
    assert pick_bucket(2000, 2000, [896, 1344]) == 1344

    # 480x640 -> (800,1067) -> 1120; 640x640 -> (800,800) -> 896
    groups = group_by_bucket(
        ["a", "b", "c"], [(480, 640), (640, 640), (426, 640)],
        [896, 1120, 1344], 800, 1333)
    assert groups[1120] == [0]
    assert groups[896] == [1]
    assert groups[1344] == [2]  # 426x640 -> (800, 1202)

    batches = list(batches_from_groups(groups, 2))
    # each bucket yields one (possibly padded) batch
    assert any(b[0] == 896 for b in batches)
    for bucket, chunk, n_real in batches:
        assert len(chunk) == 2
        assert 1 <= n_real <= 2


def test_s2d_preprocess_fused_bit_exact():
    """The fused native normalize+pad+s2d kernel must be bit-identical to
    the composition stem_space_to_depth(single_preprocessing(img)), for
    uint8 and float32 inputs across border-heavy sizes."""
    from centermask2_tpu.data.preprocess import (s2d_preprocess,
                                                 single_preprocessing,
                                                 stem_space_to_depth)

    rng = np.random.RandomState(7)
    for (h, w) in [(64, 64), (3, 5), (61, 33), (64, 17)]:
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        ref = stem_space_to_depth(
            single_preprocessing(img.astype(np.float32), 64)[None])
        got_u8 = s2d_preprocess(img, 64)
        got_f32 = s2d_preprocess(img.astype(np.float32), 64)
        assert got_u8.shape == ref.shape == (1, 17, 17, 48)
        assert np.array_equal(ref, got_u8), (h, w)
        assert np.array_equal(ref, got_f32), (h, w)


def test_s2d_preprocess_numpy_fallback(monkeypatch):
    """Without the native library the numpy fallback must produce the
    same bytes."""
    from centermask2_tpu.data import preprocess as pp

    rng = np.random.RandomState(8)
    img = (rng.rand(50, 61, 3) * 255).astype(np.uint8)
    native = pp.s2d_preprocess(img, 64)
    monkeypatch.setattr(pp, "_s2d_lib", lambda: None)
    fallback = pp.s2d_preprocess(img, 64)
    assert np.array_equal(native, fallback)
    # raw u8 pack fallback too
    native_u8 = pp.s2d_pack_u8(img, 64)
    monkeypatch.undo()
    assert native_u8.dtype == np.uint8
    monkeypatch.setattr(pp, "_s2d_lib", lambda: None)
    assert np.array_equal(native_u8, pp.s2d_pack_u8(img, 64))


def test_s2d_pack_u8_layout():
    """Raw u8 pack == space-to-depth of the zero-padded uint8 canvas."""
    from centermask2_tpu.data.preprocess import s2d_pack_u8, stem_space_to_depth

    rng = np.random.RandomState(9)
    img = (rng.rand(30, 44, 3) * 255).astype(np.uint8)
    canvas = np.zeros((64, 64, 3), np.uint8)
    canvas[:30, :44] = img
    ref = stem_space_to_depth(canvas[None])
    got = s2d_pack_u8(img, 64)
    assert got.dtype == np.uint8 and np.array_equal(ref, got)


def test_s2d_pack_u8_tight_is_top_left_block():
    """A tight-canvas pack must equal the top-left block of the full
    pack, with the full pack zero outside it — the invariant the
    device-side pad (CenterMask._pad_to_canvas) relies on."""
    from centermask2_tpu.data.preprocess import s2d_pack_u8, s2d_pack_u8_tight

    rng = np.random.RandomState(11)
    for (h, w, mult) in [(30, 44, 8), (30, 64, 8), (64, 64, 8), (7, 61, 4),
                         (33, 9, 16)]:
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        full = s2d_pack_u8(img, 64)
        tight = s2d_pack_u8_tight(img, 64, multiple=mult)
        th, tw = tight.shape[1], tight.shape[2]
        assert th <= full.shape[1] and tw <= full.shape[2]
        assert np.array_equal(full[:, :th, :tw], tight), (h, w, mult)
        padded = np.zeros_like(full)
        padded[:, :th, :tw] = tight
        assert np.array_equal(full, padded), (h, w, mult)


def test_s2d_serving_canvas_quantization():
    """The serving canvas takes at most 4 values per deployment and
    always covers the resized image."""
    from centermask2_tpu.data.preprocess import s2d_serving_canvas

    assert s2d_serving_canvas(800, 1333, 1344, 800) == (800, 1344)
    assert s2d_serving_canvas(1333, 800, 1344, 800) == (1344, 800)
    assert s2d_serving_canvas(640, 800, 1344, 800) == (800, 800)
    assert s2d_serving_canvas(801, 1333, 1344, 800) == (1344, 1344)
    # short not a multiple of 32 -> canvas aligned up to the d2
    # size_divisibility (required by tight-COMPUTE serving: FPN
    # top-down breaks on non-/32 canvases)
    ch, cw = s2d_serving_canvas(30, 61, 64, 30)
    assert ch % 32 == 0 and cw % 32 == 0 and ch >= 30 and cw >= 61
    # non-square deployment canvas: the escalation cap is PER-AXIS —
    # a (800, 1344) pad_to must keep its full 1344 width for a
    # landscape 800x1333 resize (regression: the tight-pad train path
    # used to cap both axes at pad_to[0] and reject the image)
    assert s2d_serving_canvas(800, 1333, (800, 1344), 800) == (800, 1344)
    assert s2d_serving_canvas(640, 800, (800, 1344), 800) == (800, 800)
    assert s2d_serving_canvas(800, 1333, (1344, 1344), 800) == (800, 1344)


def test_stem_space_to_depth_natural_order():
    """Channel rho*4C + kap*C + c at (i, j) holds pixel
    (4i + rho - 2, 4j + kap - 2), zero outside."""
    from centermask2_tpu.data.preprocess import stem_space_to_depth

    rng = np.random.RandomState(10)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    out = stem_space_to_depth(x)
    assert out.shape == (1, 3, 3, 48)
    for i in range(3):
        for j in range(3):
            for rho in range(4):
                for kap in range(4):
                    for c in range(3):
                        r, co = 4 * i + rho - 2, 4 * j + kap - 2
                        want = (x[0, r, co, c]
                                if 0 <= r < 8 and 0 <= co < 8 else 0.0)
                        assert out[0, i, j, rho * 12 + kap * 3 + c] == want


def test_group_by_serving_canvas():
    """Tight-compute batching groups by the quantized serving canvas of
    the RESIZED shape: landscape/portrait split, short-side dim aligned,
    oversized short side falls back to the full square."""
    from centermask2_tpu.data.bucketing import group_by_serving_canvas

    sizes = [(480, 640),   # resize -> (800, 1066): canvas (800, 1344)
             (640, 480),   # portrait -> (1066, 800): canvas (1344, 800)
             (500, 500),   # square -> (800, 800): canvas (800, 800)
             (480, 641)]   # -> (800, 1068): canvas (800, 1344)
    groups = group_by_serving_canvas(list(range(4)), sizes, 1344, 800, 1333)
    assert groups[(800, 1344)] == [0, 3]
    assert groups[(1344, 800)] == [1]
    assert groups[(800, 800)] == [2]
