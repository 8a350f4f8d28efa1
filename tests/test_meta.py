"""End-to-end smoke + contract tests on a tiny config (CPU-sized)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from centermask2_tpu.config import get_cfg
from centermask2_tpu.models import CenterMask, GroundTruth, build_centermask


def tiny_model(**overrides):
    kwargs = dict(
        conv_body="V-19-slim-eSE",
        post_nms_topk_test=10,
        pre_nms_topk_test=50,
        nms_candidates=100,
        post_nms_topk_train=20,
        pre_nms_topk_train=50,
        batch_size_per_image=32,
        max_fg_proposals=8,
        dtype=jnp.float32,
    )
    kwargs.update(overrides)
    return CenterMask(**kwargs)


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    x = jnp.zeros((1, 128, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_inference_contract_shapes(model_and_params):
    model, params = model_and_params
    x = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128, 3) * 30)
    out = model.apply(params, x)
    K = 10
    assert out.locations.shape == (1, K, 2)
    assert out.mask_scores.shape == (1, K)
    assert out.pred_boxes.shape == (1, K, 4)
    assert out.pred_classes.shape == (1, K)
    assert out.pred_masks.shape == (1, K, 1, 28, 28)
    assert out.scores.shape == (1, K)
    assert out.valid.shape == (1, K)
    # masks are probabilities
    assert float(jnp.min(out.pred_masks)) >= 0.0
    assert float(jnp.max(out.pred_masks)) <= 1.0
    # invalid slots have zero boxes and scores
    inv = ~np.asarray(out.valid[0])
    assert np.all(np.asarray(out.pred_boxes[0])[inv] == 0)


def test_inference_batched_matches_per_image(model_and_params):
    """lax.map batched serving must reproduce per-image inference."""
    model, params = model_and_params
    rng = np.random.RandomState(3)
    xb = jnp.asarray(rng.randn(2, 128, 128, 3) * 30)
    batched = model.apply(params, xb, method="inference_batched")
    for b in range(2):
        single = model.apply(params, xb[b:b + 1])
        for name in ("scores", "pred_boxes", "pred_classes", "valid",
                     "mask_scores"):
            np.testing.assert_allclose(
                np.asarray(getattr(batched, name)[b]),
                np.asarray(getattr(single, name)[0]), rtol=1e-5, atol=1e-5,
                err_msg=name)


def test_inference_jit_compiles(model_and_params):
    model, params = model_and_params
    f = jax.jit(lambda p, x: model.apply(p, x))
    x = jnp.zeros((1, 128, 128, 3))
    out = f(params, x)
    out2 = f(params, x + 1.0)  # no recompile needed (same shapes)
    assert out.scores.shape == out2.scores.shape


def test_loss_path(model_and_params):
    model, params = model_and_params
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32) * 30)
    G, P = 4, 32
    gt = GroundTruth(
        boxes=jnp.asarray([[[10, 10, 60, 60], [40, 30, 100, 90],
                            [0, 0, 0, 0], [0, 0, 0, 0]],
                           [[20, 20, 80, 100], [0, 0, 0, 0],
                            [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32),
        classes=jnp.asarray([[2, 5, 0, 0], [7, 0, 0, 0]], jnp.int32),
        valid=jnp.asarray([[True, True, False, False],
                           [True, False, False, False]]),
        mask_patches=jnp.asarray(
            (rng.rand(2, G, P, P) > 0.5).astype(np.float32)),
    )
    losses = model.apply(params, x, gt, jax.random.PRNGKey(0),
                         method=CenterMask.loss)
    expected = {"loss_fcos_cls", "loss_fcos_loc", "loss_fcos_ctr",
                "loss_mask", "loss_maskiou"}
    assert set(losses.keys()) == expected
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_loss_gradients_finite(model_and_params):
    model, params = model_and_params
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32) * 10)
    G, P = 2, 16
    gt = GroundTruth(
        boxes=jnp.asarray([[[16, 16, 90, 90], [0, 0, 0, 0]]], jnp.float32),
        classes=jnp.asarray([[1, 0]], jnp.int32),
        valid=jnp.asarray([[True, False]]),
        mask_patches=jnp.ones((1, G, P, P), jnp.float32),
    )

    def total_loss(p):
        losses = model.apply(p, x, gt, jax.random.PRNGKey(3),
                             method=CenterMask.loss)
        return sum(losses.values())

    grads = jax.grad(total_loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least some gradient must be nonzero
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_build_from_cfg():
    cfg = get_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.MASKIOU_ON = True
    cfg.MODEL.FPN.IN_FEATURES = ["stage3", "stage4", "stage5"]
    cfg.MODEL.FCOS.POST_NMS_TOPK_TEST = 50
    model = build_centermask(cfg)
    assert model.conv_body == "V-39-eSE"
    assert model.roi_in_strides == (8, 16, 32)
    assert model.post_nms_topk_test == 50


def test_keypoint_branch():
    """Keypoint head wired through inference and loss (KEYPOINT_ON)."""
    model = tiny_model(keypoint_on=True, mask_on=False, maskiou_on=False)
    x = jnp.zeros((1, 128, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.pred_keypoints.shape == (1, 10, 17, 3)

    rng = np.random.RandomState(5)
    G, P = 2, 16
    kps = np.zeros((1, G, 17, 3), np.float32)
    kps[0, 0, :, 0] = np.linspace(20, 80, 17)  # x
    kps[0, 0, :, 1] = np.linspace(20, 80, 17)  # y
    kps[0, 0, :, 2] = 2  # visible
    gt = GroundTruth(
        boxes=jnp.asarray([[[16, 16, 90, 90], [0, 0, 0, 0]]], jnp.float32),
        classes=jnp.asarray([[1, 0]], jnp.int32),
        valid=jnp.asarray([[True, False]]),
        mask_patches=jnp.ones((1, G, P, P), jnp.float32),
        keypoints=jnp.asarray(kps),
    )
    losses = model.apply(params, jnp.asarray(rng.randn(1, 128, 128, 3) * 10,
                                             jnp.float32),
                         gt, jax.random.PRNGKey(1), method=CenterMask.loss)
    assert "loss_keypoint" in losses
    assert np.isfinite(float(losses["loss_keypoint"]))


def test_mobilenet_backbone_from_cfg():
    cfg = get_cfg()
    cfg.MODEL.MOBILENET = True
    cfg.MODEL.BACKBONE.NAME = "build_fcos_mobilenetv2_fpn_backbone"
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FCOS.POST_NMS_TOPK_TEST = 5
    cfg.MODEL.FCOS.PRE_NMS_TOPK_TEST = 20
    cfg.TPU.NMS_CANDIDATES = 20
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_centermask(cfg)
    assert model.backbone_type == "mobilenet"
    x = jnp.zeros((1, 128, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.scores.shape == (1, 5)


def test_uint8_s2d_input_bit_identical():
    """The RAW uint8 s2d serving input (on-device normalization,
    CenterMask._normalize_u8_s2d) must produce bit-identical outputs to
    the host-normalized f32 s2d path."""
    from centermask2_tpu.data.preprocess import s2d_pack_u8, s2d_preprocess

    rng = np.random.RandomState(5)
    model = tiny_model(s2d_input=True, mask_on=True, maskiou_on=True,
                       nms_candidates=50, pre_nms_topk_test=50)
    img = (rng.rand(50, 61, 3) * 255).astype(np.uint8)
    x_f32 = jnp.asarray(s2d_preprocess(img, 64))
    x_u8 = jnp.asarray(s2d_pack_u8(img, 64))
    hw = jnp.asarray([[50, 61]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x_f32)
    out_f = model.apply(params, x_f32)
    out_u = model.apply(params, x_u8, None, hw)
    for name in out_f._fields:
        a = np.asarray(getattr(out_f, name))
        b = np.asarray(getattr(out_u, name))
        assert np.array_equal(a, b), name

    # TIGHT pack + device pad (canvas_hw) must also be bit-identical:
    # the serving transfer optimization changes bytes on the link, not
    # any math (data/preprocess.py:s2d_pack_u8_tight).
    from centermask2_tpu.data.preprocess import s2d_pack_u8_tight

    x_t = jnp.asarray(s2d_pack_u8_tight(img, 64, multiple=8))
    assert x_t.size < x_u8.size
    out_t = model.apply(params, x_t, None, hw, canvas_hw=(64, 64))
    for name in out_f._fields:
        a = np.asarray(getattr(out_f, name))
        b = np.asarray(getattr(out_t, name))
        assert np.array_equal(a, b), name


def test_eval_loop_tight_pack_matches_full(tmp_path):
    """evaluate_dataset with the TIGHT serving pack (auto for s2d
    models) must produce exactly the same predictions as the full-canvas
    u8 path — the transfer optimization changes link bytes, not math."""
    import json

    from PIL import Image

    from centermask2_tpu.evaluation.loop import evaluate_dataset

    rng = np.random.RandomState(3)
    (tmp_path / "images").mkdir()
    images, anns = [], []
    for i, (w, h) in enumerate([(120, 80), (70, 110)], 1):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / "images" / f"{i:012d}.jpg")
        images.append({"id": i, "file_name": f"{i:012d}.jpg",
                       "width": w, "height": h})
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [10, 10, 40, 30], "area": 1200, "iscrowd": 0,
                     "segmentation": [[10, 10, 50, 10, 50, 40, 10, 40]]})
    ann = tmp_path / "ann.json"
    with open(ann, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "thing"}]}, f)

    # pre_nms_thresh 0: random-init scores sit near the 0.01 prior,
    # below the default 0.05; num_classes=1 so every prediction maps to
    # the dataset's single category instead of being dropped
    model = tiny_model(s2d_input=True, pre_nms_thresh_test=0.0,
                       num_classes=1)
    x0 = jnp.zeros((1, 17, 17, 48), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)

    common = dict(ann=str(ann), image_root=str(tmp_path / "images"),
                  fixed_size=64, min_size=32, max_size=60,
                  progress_every=0)
    _, _, ev_tight = evaluate_dataset(model, variables, **common)
    _, _, ev_full = evaluate_dataset(model, variables, tight=False,
                                     **common)
    assert ev_tight.predictions == ev_full.predictions
    assert len(ev_tight.predictions) > 0


def test_keypoint_infer_to_eval_pipeline():
    """KEYPOINT_ON end to end: model inference -> wrap -> postprocess
    (keypoint rescale) -> COCOEvaluator keypoints task produces finite
    metrics (VERDICT r2 item 4)."""
    from centermask2_tpu.data import detector_postprocess, single_wrap_outputs
    from centermask2_tpu.evaluation import COCOEvaluator, COCOGt

    model = tiny_model(keypoint_on=True, mask_on=False, maskiou_on=False)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32) * 30)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)

    out_b = jax.tree.map(lambda a: a[0], out)
    valid = np.asarray(out_b.valid)
    tup = (out_b.locations[valid], out_b.mask_scores[valid],
           out_b.pred_boxes[valid], out_b.pred_classes[valid],
           out_b.pred_masks[valid], out_b.scores[valid],
           out_b.pred_keypoints[valid])
    wrapped = single_wrap_outputs(tup)
    assert "pred_keypoints" in wrapped
    post = detector_postprocess(wrapped, 100, 100)
    n = len(post["pred_boxes"])
    assert post["pred_keypoints"].shape == (n, 17, 3)

    gt = COCOGt({
        "images": [{"id": 1, "height": 100, "width": 100}],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
            "bbox": [10, 10, 50, 50], "area": 2500,
            "keypoints": [20.0, 20.0, 2] * 17, "num_keypoints": 17,
        }],
        "categories": [{"id": 1, "name": "person"}],
    })
    ev = COCOEvaluator(gt, tasks=("keypoints",),
                       category_id_map={c: 1 for c in range(80)})
    ev.process(1, post)
    res = ev.evaluate()
    assert np.isfinite(res["keypoints"]["AP"]) or n == 0


def test_rect_canvas_inference_contract():
    """Tight-canvas serving mode: the device program runs at a
    RECTANGULAR /32 canvas (e.g. 800x1088 for a resized 800x1066 d2-eval
    image) instead of the fixed deployment square — the apples-to-apples
    workload the reference's published 0.050 s/img was measured on
    (detectron2 pads to /32 per image, deploy_utils.py pads to the
    square only for the ONNX contract). The model is fully
    convolutional, so a rect canvas is just another static shape."""
    model = tiny_model()
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 96, 160, 3).astype(np.float32) * 30)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    K = 10
    assert out.pred_boxes.shape == (1, K, 4)
    assert out.pred_masks.shape == (1, K, 1, 28, 28)
    assert np.all(np.isfinite(np.asarray(out.scores)))
    # decoded boxes live inside the rect canvas
    b = np.asarray(out.pred_boxes[0])[np.asarray(out.valid[0])]
    if b.size:
        assert b[:, 0].min() >= -1 and b[:, 2].max() <= 161
        assert b[:, 1].min() >= -1 and b[:, 3].max() <= 97


def test_rect_canvas_feature_crop_parity_fcn_backbone():
    """Locality of the rect-canvas mode, pinned at the stage level: away
    from the rect canvas's bottom boundary, ResNet stage features at the
    rect canvas are EXACTLY the crop of the square-canvas features — any
    stride/padding misalignment a non-square shape introduced would
    shift the whole map and break this bitwise.

    Near the boundary they legitimately differ: activations bleed past
    the image edge (receptive fields), the smaller canvas truncates that
    bleed where the larger one keeps propagating it, and each in-stage
    3x3 conv widens the affected band by one row — so at toy sizes the
    deep stages (and the FPN top-down path, which mixes res5 into p3)
    diverge everywhere. That truncation is not an artifact: it is
    exactly how detectron2 eval (tight /32 canvases — the published-AP
    numerics) differs from the reference's own 1344-square ONNX deploy
    mode. We pin the interior-exactness AND that the boundary-band
    divergence is small relative to the signal."""
    from centermask2_tpu.models.backbones.resnet import ResNet

    backbone = ResNet(depth=50, out_features=("res2", "res3"))
    rng = np.random.RandomState(11)
    img = rng.randn(64, 96, 3).astype(np.float32) * 30
    rect = np.zeros((1, 96, 128, 3), np.float32)
    rect[0, :64, :96] = img
    square = np.zeros((1, 128, 128, 3), np.float32)
    square[0, :64, :96] = img
    params = backbone.init(jax.random.PRNGKey(0), jnp.asarray(rect))
    f_rect = backbone.apply(params, jnp.asarray(rect))
    f_sq = backbone.apply(params, jnp.asarray(square))

    # res2 (1 in-stage band row from 3 blocks at stride 4 vs the 8-row
    # gap to the boundary): exact crop everywhere
    a, b = np.asarray(f_rect["res2"]), np.asarray(f_sq["res2"])
    np.testing.assert_array_equal(a, b[:, : a.shape[1], : a.shape[2]],
                                  err_msg="res2")
    # res3: exact outside the ~2-row boundary band, small inside it
    a, b = np.asarray(f_rect["res3"]), np.asarray(f_sq["res3"])
    H = a.shape[1]
    np.testing.assert_array_equal(
        a[:, : H - 2], b[:, : H - 2, : a.shape[2]], err_msg="res3 interior")
    band = np.abs(a[:, H - 2:] - b[:, H - 2: H, : a.shape[2]]).max()
    scale = np.abs(b[:, H - 2: H]).max() + 1e-6
    assert band / scale < 0.05, (band, scale)
