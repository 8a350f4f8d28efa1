import os
import tempfile

import pytest

from centermask2_tpu.config import get_cfg


def test_defaults_match_reference_schema():
    cfg = get_cfg()
    # reference: centermask2/centermask/config/defaults.py
    assert cfg.MODEL.FCOS.NUM_CLASSES == 80
    assert cfg.MODEL.FCOS.FPN_STRIDES == [8, 16, 32, 64, 128]
    assert cfg.MODEL.FCOS.NMS_TH == 0.6
    assert cfg.MODEL.FCOS.PRE_NMS_TOPK_TEST == 1000
    assert cfg.MODEL.FCOS.SIZES_OF_INTEREST == [64, 128, 256, 512]
    assert cfg.MODEL.VOVNET.CONV_BODY == "V-39-eSE"
    assert cfg.MODEL.VOVNET.NORM == "FrozenBN"
    assert cfg.MODEL.ROI_MASKIOU_HEAD.NUM_CONV == 4
    assert cfg.MODEL.PIXEL_MEAN == [103.530, 116.280, 123.675]


def test_yaml_base_inheritance_and_opts():
    base = """
MODEL:
  MASK_ON: True
  FCOS:
    POST_NMS_TOPK_TEST: 50
SOLVER:
  BASE_LR: 0.01
"""
    child = """
_BASE_: "base.yaml"
MODEL:
  VOVNET:
    CONV_BODY: "V-39-eSE"
SOLVER:
  MAX_ITER: 270000
"""
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "base.yaml"), "w") as f:
            f.write(base)
        child_path = os.path.join(d, "child.yaml")
        with open(child_path, "w") as f:
            f.write(child)
        cfg = get_cfg()
        cfg.merge_from_file(child_path)
    assert cfg.MODEL.MASK_ON is True
    assert cfg.MODEL.FCOS.POST_NMS_TOPK_TEST == 50
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.SOLVER.MAX_ITER == 270000

    cfg.merge_from_list(["MODEL.FCOS.NMS_TH", "0.5", "MODEL.MASK_ON", "False"])
    assert cfg.MODEL.FCOS.NMS_TH == 0.5
    assert cfg.MODEL.MASK_ON is False


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.MASK_ON = True
    cfg.defrost()
    cfg.MODEL.MASK_ON = True
    assert cfg.MODEL.MASK_ON


def test_tuple_list_coercion():
    cfg = get_cfg()
    cfg.merge_from_list(["SOLVER.STEPS", "(210000, 250000)"])
    assert tuple(cfg.SOLVER.STEPS) == (210000, 250000)


def test_detections_per_image_caps_topk():
    """TEST.DETECTIONS_PER_IMAGE binds when tighter than POST_NMS_TOPK."""
    from centermask2_tpu.config import get_cfg
    from centermask2_tpu.models import build_centermask

    cfg = get_cfg()
    assert build_centermask(cfg).post_nms_topk_test == \
        min(cfg.MODEL.FCOS.POST_NMS_TOPK_TEST, cfg.TEST.DETECTIONS_PER_IMAGE)
    cfg.TEST.DETECTIONS_PER_IMAGE = 7
    assert build_centermask(cfg).post_nms_topk_test == 7


def test_keypoint_loss_config_wiring():
    """ROI_KEYPOINT_HEAD.LOSS_WEIGHT and
    NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS reach the model."""
    from centermask2_tpu.config import get_cfg
    from centermask2_tpu.models import build_centermask

    cfg = get_cfg()
    cfg.MODEL.ROI_KEYPOINT_HEAD.LOSS_WEIGHT = 2.5
    cfg.MODEL.ROI_KEYPOINT_HEAD.NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS = False
    m = build_centermask(cfg)
    assert m.keypoint_loss_weight == 2.5
    assert m.keypoint_normalize_by_visible is False


def test_keypoint_loss_normalizer_semantics():
    """keypoint_rcnn_loss: explicit normalizer divides by the fixed
    count; None divides by the visible count (reference
    keypoint_head.py:81-84)."""
    import jax.numpy as jnp
    import numpy as np

    from centermask2_tpu.models.roi.keypoint_head import keypoint_rcnn_loss

    rng = np.random.RandomState(0)
    R, S, K = 3, 8, 4
    logits = jnp.asarray(rng.randn(R, S, S, K).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, S * S, (R, K)))
    valid = jnp.asarray(np.ones((R, K), bool))
    by_visible = float(keypoint_rcnn_loss(logits, targets, valid))
    fixed = float(keypoint_rcnn_loss(logits, targets, valid,
                                     normalizer=float(2 * R * K)))
    assert fixed == pytest.approx(by_visible / 2, rel=1e-5)


def test_every_shipped_config_builds():
    """Each yaml in configs/centermask builds a model whose forward
    shape-checks (eval_shape: no compile) — guards config/builder drift
    across the whole shipped zoo (ResNet, VoVNet specs incl. dw,
    MobileNet)."""
    import glob
    import os

    import jax
    import jax.numpy as jnp

    from centermask2_tpu.models import build_centermask

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "centermask")
    yamls = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert len(yamls) >= 10
    for y in yamls:
        if os.path.basename(y).startswith("Base-"):
            continue
        cfg = get_cfg()
        cfg.merge_from_file(y)
        cfg.MODEL.FCOS.POST_NMS_TOPK_TEST = 5
        cfg.MODEL.FCOS.PRE_NMS_TOPK_TEST = 20
        cfg.TPU.NMS_CANDIDATES = 20
        model = build_centermask(cfg)
        x = jnp.zeros((1, 64, 64, 48 if model.s2d_input else 3))
        if model.s2d_input:
            x = jnp.zeros((1, 17, 17, 48))
        out = jax.eval_shape(
            lambda m=model, xx=x: m.init(jax.random.PRNGKey(0), xx))
        assert "params" in out, y
