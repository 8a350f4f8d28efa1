"""Full-model cross-framework parity: a complete torch CenterMask
(V-19-slim-eSE + FPN + FCOS + SAG-Mask + MaskIoU), built HERE from the
same per-module semantics the per-module oracle tests pin, whose
reference-schema state_dict goes through checkpoint/convert_torch.py and
whose final boxes/scores/classes/masks/mask_scores must match the JAX
model.

This is the strongest AP-parity proxy available in a weightless
environment: per-module oracles cannot catch cross-module wiring or
converter bugs; this test exercises the whole inference graph plus the
checkpoint converter end to end (reference flow: tester.py:94-105 "mod"
vs "origin" parity ladder).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

BN_EPS = 1e-5
NUM_CLASSES = 5
CANVAS = 160
STRIDES = (8, 16, 32, 64, 128)
PRE_NMS_THRESH = 0.05
NMS_THRESH = 0.6
POST_NMS_TOPK = 15

# V-19-slim-eSE spec (reference vovnet.py:30-108)
STEM = [64, 64, 128]
STAGE_CONV = [64, 80, 96, 112]
STAGE_OUT = [112, 256, 384, 512]
LAYER_PER_BLOCK = 3


# --------------------------------------------------------------- weights
def _sd_builders(sd, rng):
    def conv(key, cin, cout, k=3, bias=False, std=0.05):
        sd[f"{key}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * std
        if bias:
            sd[f"{key}.bias"] = rng.randn(cout).astype(np.float32) * 0.05

    def bn(key, c):
        sd[f"{key}.weight"] = (1.0 + 0.2 * rng.randn(c)).astype(np.float32)
        sd[f"{key}.bias"] = (0.1 * rng.randn(c)).astype(np.float32)
        sd[f"{key}.running_mean"] = (0.1 * rng.randn(c)).astype(np.float32)
        sd[f"{key}.running_var"] = (
            0.5 + rng.rand(c).astype(np.float32))

    def gn(key, c):
        sd[f"{key}.weight"] = (1.0 + 0.2 * rng.randn(c)).astype(np.float32)
        sd[f"{key}.bias"] = (0.1 * rng.randn(c)).astype(np.float32)

    def linear(key, cin, cout, std=0.05):
        sd[f"{key}.weight"] = rng.randn(cout, cin).astype(np.float32) * std
        sd[f"{key}.bias"] = rng.randn(cout).astype(np.float32) * 0.05

    return conv, bn, gn, linear


def _add_head_sd(sd, rng, lateral_channels, num_classes=NUM_CLASSES):
    """FPN + FCOS + mask + maskiou sections (backbone-agnostic);
    lateral_channels: the three bottom-up output widths at stages 3/4/5."""
    NUM_CLASSES = num_classes  # noqa: N806 — shadow for the body below
    conv, bn, gn, linear = _sd_builders(sd, rng)

    for s, c in zip((3, 4, 5), lateral_channels):
        conv(f"backbone.fpn_lateral{s}", c, 256, k=1, bias=True)
        conv(f"backbone.fpn_output{s}", 256, 256, k=3, bias=True)
    conv("backbone.top_block.p6", 256, 256, k=3, bias=True)
    conv("backbone.top_block.p7", 256, 256, k=3, bias=True)

    fh = "proposal_generator.fcos_head."
    for tower in ("cls_tower", "bbox_tower"):
        for i in range(4):
            conv(f"{fh}{tower}.{i * 3}", 256, 256, k=3, bias=True)
            gn(f"{fh}{tower}.{i * 3 + 1}", 256)
    conv(f"{fh}cls_logits", 256, NUM_CLASSES, k=3, bias=True, std=0.1)
    # bias near the candidate threshold so a moderate number of
    # (location, class) pairs clears pre_nms_thresh
    sd[f"{fh}cls_logits.bias"] = np.full(NUM_CLASSES, -3.0, np.float32) \
        + 0.3 * rng.randn(NUM_CLASSES).astype(np.float32)
    conv(f"{fh}bbox_pred", 256, 4, k=3, bias=True, std=0.1)
    sd[f"{fh}bbox_pred.bias"] = np.full(4, 1.5, np.float32)
    conv(f"{fh}ctrness", 256, 1, k=3, bias=True, std=0.1)
    for l in range(5):
        sd[f"{fh}scales.{l}.scale"] = np.asarray(
            [1.0 + 0.1 * rng.randn()], np.float32)  # torch Scale is (1,)

    mh = "roi_heads.mask_head."
    ch = 256
    for k in range(1, 5):
        conv(f"{mh}mask_fcn{k}", ch, 256, k=3, bias=True)
    conv(f"{mh}spatialAtt.conv", 2, 1, k=3, bias=False, std=0.3)
    sd[f"{mh}deconv.weight"] = rng.randn(256, 256, 2, 2).astype(np.float32) * 0.05
    sd[f"{mh}deconv.bias"] = rng.randn(256).astype(np.float32) * 0.05
    conv(f"{mh}predictor", 256, NUM_CLASSES, k=1, bias=True, std=0.1)

    ih = "roi_heads.maskiou_head."
    conv(f"{ih}maskiou_fcn1", 257, 256, k=3, bias=True)
    for k in range(2, 5):
        conv(f"{ih}maskiou_fcn{k}", 256, 256, k=3, bias=True)
    linear(f"{ih}maskiou_fc1", 256 * 7 * 7, 1024, std=0.01)
    linear(f"{ih}maskiou_fc2", 1024, 1024, std=0.02)
    linear(f"{ih}maskiou", 1024, NUM_CLASSES, std=0.02)


def _make_state_dict(rng: np.random.RandomState, stem=STEM,
                     stage_conv=STAGE_CONV, stage_out=STAGE_OUT,
                     layer_per_block=LAYER_PER_BLOCK,
                     block_per_stage=(1, 1, 1, 1),
                     num_classes=NUM_CLASSES):
    """Reference-key-schema random checkpoint (detectron2 GeneralizedRCNN
    naming; see checkpoint/convert_torch.py docstring). Multi-block stages
    emit OSA{stage}_{b} sections with the block-2+ input width equal to
    the stage output (identity residual, reference vovnet.py:310-332)."""
    sd = {}
    conv, bn, gn, linear = _sd_builders(sd, rng)

    bb = "backbone.bottom_up."
    conv(f"{bb}stem.stem_1/conv", 3, stem[0])
    bn(f"{bb}stem.stem_1/norm", stem[0])
    conv(f"{bb}stem.stem_2/conv", stem[0], stem[1])
    bn(f"{bb}stem.stem_2/norm", stem[1])
    conv(f"{bb}stem.stem_3/conv", stem[1], stem[2])
    bn(f"{bb}stem.stem_3/norm", stem[2])

    in_ch = stem[2]
    for i in range(4):
        stage = i + 2
        for b in range(block_per_stage[i]):
            mod = f"OSA{stage}_{b + 1}"
            ch = in_ch
            for l in range(layer_per_block):
                conv(f"{bb}stage{stage}.{mod}.layers.{l}.{mod}_{l}/conv",
                     ch, stage_conv[i])
                bn(f"{bb}stage{stage}.{mod}.layers.{l}.{mod}_{l}/norm",
                   stage_conv[i])
                ch = stage_conv[i]
            concat_in = in_ch + layer_per_block * stage_conv[i]
            conv(f"{bb}stage{stage}.{mod}.concat.{mod}_concat/conv",
                 concat_in, stage_out[i], k=1)
            bn(f"{bb}stage{stage}.{mod}.concat.{mod}_concat/norm",
               stage_out[i])
            conv(f"{bb}stage{stage}.{mod}.ese.fc", stage_out[i],
                 stage_out[i], k=1, bias=True)
            in_ch = stage_out[i]

    _add_head_sd(sd, rng, stage_out[1:], num_classes=num_classes)
    return sd


# ResNet-50 test dims (narrow: width_per_group=16, res2_out=64, stem 16)
RN_STEM = 16
RN_RES2_OUT = 64
RN_WIDTH = 16
RN_BLOCKS = (3, 4, 6, 3)


def _make_resnet_state_dict(rng: np.random.RandomState):
    """detectron2 ResNet-50 key schema (stem.conv1, res{s}.{b}.conv{1..3}
    [.norm], res{s}.{b}.shortcut) + the shared head sections."""
    sd = {}
    conv, bn, gn, linear = _sd_builders(sd, rng)

    bb = "backbone.bottom_up."

    def conv_norm(key, cin, cout, k=3):
        conv(f"{bb}{key}", cin, cout, k=k)
        bn(f"{bb}{key}.norm", cout)

    conv_norm("stem.conv1", 3, RN_STEM, k=7)
    in_ch, bott, out_ch = RN_STEM, RN_WIDTH, RN_RES2_OUT
    for i, n_blocks in enumerate(RN_BLOCKS):
        stage = i + 2
        for b in range(n_blocks):
            conv_norm(f"res{stage}.{b}.conv1", in_ch if b == 0 else out_ch,
                      bott, k=1)
            conv_norm(f"res{stage}.{b}.conv2", bott, bott, k=3)
            conv_norm(f"res{stage}.{b}.conv3", bott, out_ch, k=1)
            if b == 0:
                conv_norm(f"res{stage}.{b}.shortcut", in_ch, out_ch, k=1)
        in_ch, bott, out_ch = out_ch, bott * 2, out_ch * 2

    _add_head_sd(sd, rng, (RN_RES2_OUT * 2, RN_RES2_OUT * 4, RN_RES2_OUT * 8))
    return sd


# --------------------------------------------------------- torch forward
def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key]))


def _conv_bn_relu(x, sd, base, stride=1, pad=1):
    w = _t(sd, f"{base}/conv.weight")
    x = TF.conv2d(x, w, stride=stride, padding=pad)
    g, b, m, v = (_t(sd, f"{base}/norm.{s}") for s in
                  ("weight", "bias", "running_mean", "running_var"))
    scale = g / torch.sqrt(v + BN_EPS)
    shift = b - m * scale
    x = x * scale[None, :, None, None] + shift[None, :, None, None]
    return TF.relu(x)


def _ese(x, sd, base):
    pooled = x.mean(dim=(2, 3))  # (N, C)
    w = _t(sd, f"{base}.weight")[:, :, 0, 0]  # (C, C)
    gate = pooled @ w.t() + _t(sd, f"{base}.bias")
    gate = torch.clamp(gate + 3.0, 0.0, 6.0) / 6.0  # hsigmoid
    return x * gate[:, :, None, None]


def _torch_backbone(x, sd, layer_per_block=LAYER_PER_BLOCK,
                    block_per_stage=(1, 1, 1, 1)):
    bb = "backbone.bottom_up."
    x = _conv_bn_relu(x, sd, f"{bb}stem.stem_1", stride=2)
    x = _conv_bn_relu(x, sd, f"{bb}stem.stem_2", stride=1)
    x = _conv_bn_relu(x, sd, f"{bb}stem.stem_3", stride=2)
    outs = {}
    for i in range(4):
        stage = i + 2
        if stage > 2:
            x = TF.max_pool2d(x, 3, stride=2, ceil_mode=True)
        for b in range(block_per_stage[i]):
            mod = f"OSA{stage}_{b + 1}"
            identity = x
            feats = [x]
            for l in range(layer_per_block):
                x = _conv_bn_relu(
                    x, sd, f"{bb}stage{stage}.{mod}.layers.{l}.{mod}_{l}")
                feats.append(x)
            x = torch.cat(feats, dim=1)
            x = _conv_bn_relu(
                x, sd, f"{bb}stage{stage}.{mod}.concat.{mod}_concat", pad=0)
            x = _ese(x, sd, f"{bb}stage{stage}.{mod}.ese.fc")
            if b > 0:  # identity residual (reference vovnet.py:310-332)
                x = x + identity
        outs[f"stage{stage}"] = x
    return outs


def _rn_conv_bn(x, sd, key, stride=1, pad=0, relu=True):
    """detectron2 Conv2d+FrozenBN with the resnet naming (key.norm.*)."""
    x = TF.conv2d(x, _t(sd, f"{key}.weight"), stride=stride, padding=pad)
    g, b, m, v = (_t(sd, f"{key}.norm.{s}") for s in
                  ("weight", "bias", "running_mean", "running_var"))
    scale = g / torch.sqrt(v + BN_EPS)
    shift = b - m * scale
    x = x * scale[None, :, None, None] + shift[None, :, None, None]
    return TF.relu(x) if relu else x


def _torch_resnet(x, sd):
    """detectron2 ResNet-50 (BasicStem + Bottleneck, STRIDE_IN_1X1);
    returns {"stage3/4/5"} so _torch_fpn applies unchanged."""
    bb = "backbone.bottom_up."
    x = _rn_conv_bn(x, sd, f"{bb}stem.conv1", stride=2, pad=3)
    x = TF.max_pool2d(x, 3, stride=2, padding=1)
    outs = {}
    for i, n_blocks in enumerate(RN_BLOCKS):
        stage = i + 2
        first_stride = 1 if stage == 2 else 2
        for b in range(n_blocks):
            base = f"{bb}res{stage}.{b}"
            s = first_stride if b == 0 else 1
            out = _rn_conv_bn(x, sd, f"{base}.conv1", stride=s)  # stride_in_1x1
            out = _rn_conv_bn(out, sd, f"{base}.conv2", stride=1, pad=1)
            out = _rn_conv_bn(out, sd, f"{base}.conv3", relu=False)
            if b == 0:
                short = _rn_conv_bn(x, sd, f"{base}.shortcut", stride=s,
                                    relu=False)
            else:
                short = x
            x = TF.relu(out + short)
        outs[f"stage{stage}"] = x
    return outs


def _torch_fpn(feats, sd):
    lat = {}
    for s, f in zip((3, 4, 5), (feats["stage3"], feats["stage4"],
                                feats["stage5"])):
        lat[s] = TF.conv2d(f, _t(sd, f"backbone.fpn_lateral{s}.weight"),
                           _t(sd, f"backbone.fpn_lateral{s}.bias"))
    out = {}
    prev = lat[5]
    out[5] = TF.conv2d(prev, _t(sd, "backbone.fpn_output5.weight"),
                       _t(sd, "backbone.fpn_output5.bias"), padding=1)
    for s in (4, 3):
        td = TF.interpolate(prev, scale_factor=2, mode="nearest")
        td = td[:, :, : lat[s].shape[2], : lat[s].shape[3]]
        prev = lat[s] + td
        out[s] = TF.conv2d(prev, _t(sd, f"backbone.fpn_output{s}.weight"),
                           _t(sd, f"backbone.fpn_output{s}.bias"), padding=1)
    p6 = TF.conv2d(out[5], _t(sd, "backbone.top_block.p6.weight"),
                   _t(sd, "backbone.top_block.p6.bias"), stride=2, padding=1)
    p7 = TF.conv2d(TF.relu(p6), _t(sd, "backbone.top_block.p7.weight"),
                   _t(sd, "backbone.top_block.p7.bias"), stride=2, padding=1)
    out[6], out[7] = p6, p7
    return [out[s] for s in (3, 4, 5, 6, 7)]


def _torch_fcos_head(levels, sd):
    fh = "proposal_generator.fcos_head."

    def tower(x, name):
        for i in range(4):
            x = TF.conv2d(x, _t(sd, f"{fh}{name}.{i * 3}.weight"),
                          _t(sd, f"{fh}{name}.{i * 3}.bias"), padding=1)
            x = TF.group_norm(x, 32, _t(sd, f"{fh}{name}.{i * 3 + 1}.weight"),
                              _t(sd, f"{fh}{name}.{i * 3 + 1}.bias"), BN_EPS)
            x = TF.relu(x)
        return x

    logits, regs, ctrs = [], [], []
    for lvl, f in enumerate(levels):
        cls_f = tower(f, "cls_tower")
        box_f = tower(f, "bbox_tower")
        logits.append(TF.conv2d(cls_f, _t(sd, f"{fh}cls_logits.weight"),
                                _t(sd, f"{fh}cls_logits.bias"), padding=1))
        ctrs.append(TF.conv2d(box_f, _t(sd, f"{fh}ctrness.weight"),
                              _t(sd, f"{fh}ctrness.bias"), padding=1))
        reg = TF.conv2d(box_f, _t(sd, f"{fh}bbox_pred.weight"),
                        _t(sd, f"{fh}bbox_pred.bias"), padding=1)
        reg = reg * float(sd[f"{fh}scales.{lvl}.scale"][0])
        regs.append(TF.relu(reg))
    return logits, regs, ctrs


def _np_decode(logits, regs, ctrs):
    """Reference decode on the full candidate set (caps chosen so no
    top-k truncation binds): sigmoid, cls > 0.05, boxes loc +- reg*stride,
    score sqrt(cls*ctr), class-offset greedy NMS, top-POST_NMS_TOPK."""
    boxes, scores, classes, locs = [], [], [], []
    n_cand = 0
    for lvl, (lg, rg, ct) in enumerate(zip(logits, regs, ctrs)):
        stride = STRIDES[lvl]
        h, w = lg.shape[2], lg.shape[3]
        cls_sig = torch.sigmoid(lg)[0].permute(1, 2, 0).reshape(-1, NUM_CLASSES).numpy()
        ctr_sig = torch.sigmoid(ct)[0, 0].reshape(-1).numpy()
        reg = rg[0].permute(1, 2, 0).reshape(-1, 4).numpy() * stride
        xs = (np.arange(w) * stride + stride // 2).astype(np.float32)
        ys = (np.arange(h) * stride + stride // 2).astype(np.float32)
        loc = np.stack([np.tile(xs[None, :], (h, 1)).reshape(-1),
                        np.tile(ys[:, None], (1, w)).reshape(-1)], axis=1)
        cand = cls_sig > PRE_NMS_THRESH
        scored = cls_sig * ctr_sig[:, None]
        rows, cols = np.nonzero(cand)
        n_cand += len(rows)
        for li, ci in zip(rows, cols):
            x, y = loc[li]
            l, t, r, b = reg[li]
            boxes.append([x - l, y - t, x + r, y + b])
            scores.append(math.sqrt(max(scored[li, ci], 0.0)))
            classes.append(ci)
            locs.append([x, y])
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    scores = np.asarray(scores, np.float32)
    classes = np.asarray(classes, np.int64)
    locs = np.asarray(locs, np.float32).reshape(-1, 2)

    # class-offset greedy NMS (torchvision batched_nms semantics)
    order = np.argsort(-scores)
    offs = classes[:, None].astype(np.float32) * (boxes.max() + 1.0)
    shifted = boxes + offs
    sup = np.zeros(len(boxes), bool)
    keep = []
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        bi = shifted[i]
        for j in order:
            if sup[j] or j == i:
                continue
            bj = shifted[j]
            ix0, iy0 = max(bi[0], bj[0]), max(bi[1], bj[1])
            ix1, iy1 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(ix1 - ix0, 0.0) * max(iy1 - iy0, 0.0)
            a = (bi[2] - bi[0]) * (bi[3] - bi[1])
            b = (bj[2] - bj[0]) * (bj[3] - bj[1])
            u = a + b - inter
            if u > 0 and inter / u > NMS_THRESH:
                sup[j] = True
    keep = keep[:POST_NMS_TOPK]
    return (boxes[keep], scores[keep], classes[keep], locs[keep], n_cand)


def _torch_pool(fpn_levels, boxes, img_area=None):
    """Ratio level assignment + ROIAlignV2 -> (R, 14, 14, 256)."""
    from test_ops import np_roi_align

    R = len(boxes)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    if img_area is None:
        img_area = float(CANVAS * CANVAS)
    lv = np.ceil(5 - np.log2(img_area / np.maximum(areas, 1e-12)
                             + 2.220446049250313e-16))
    lv = np.clip(lv, 3, 5).astype(np.int64) - 3

    pooled = np.zeros((R, 14, 14, 256), np.float32)
    for lvl in range(3):
        feat = fpn_levels[lvl][0].permute(1, 2, 0).numpy()
        sel = np.nonzero(lv == lvl)[0]
        if len(sel):
            pooled[sel] = np_roi_align(
                feat, boxes[sel], 1.0 / STRIDES[lvl], 14, 2, aligned=True)
    return pooled


def _torch_roi_branch(fpn_levels, sd, boxes, classes, scores,
                      img_area=None):
    """Ratio level assignment + ROIAlignV2 + SAG-Mask + MaskIoU."""
    mh, ih = "roi_heads.mask_head.", "roi_heads.maskiou_head."
    R = len(boxes)
    pooled = _torch_pool(fpn_levels, boxes, img_area)

    x = torch.from_numpy(pooled).permute(0, 3, 1, 2)  # (R, 256, 14, 14)
    for k in range(1, 5):
        x = TF.relu(TF.conv2d(x, _t(sd, f"{mh}mask_fcn{k}.weight"),
                              _t(sd, f"{mh}mask_fcn{k}.bias"), padding=1))
    att = torch.cat([x.mean(dim=1, keepdim=True),
                     x.max(dim=1, keepdim=True).values], dim=1)
    att = torch.sigmoid(TF.conv2d(
        att, _t(sd, f"{mh}spatialAtt.conv.weight"), padding=1))
    x = x * att
    x = TF.relu(TF.conv_transpose2d(x, _t(sd, f"{mh}deconv.weight"),
                                    _t(sd, f"{mh}deconv.bias"), stride=2))
    mask_logits = TF.conv2d(x, _t(sd, f"{mh}predictor.weight"),
                            _t(sd, f"{mh}predictor.bias"))  # (R, C, 28, 28)
    sel = mask_logits[np.arange(R), classes]  # (R, 28, 28)
    mask_probs = torch.sigmoid(sel)

    # MaskIoU: concat(pooled, maxpool2x2(mask)), convs (last s2), FCs
    mp = TF.max_pool2d(mask_probs[:, None], 2, stride=2)  # (R, 1, 14, 14)
    y = torch.cat([torch.from_numpy(pooled).permute(0, 3, 1, 2), mp], dim=1)
    for k in range(1, 5):
        s = 2 if k == 4 else 1
        y = TF.relu(TF.conv2d(y, _t(sd, f"{ih}maskiou_fcn{k}.weight"),
                              _t(sd, f"{ih}maskiou_fcn{k}.bias"),
                              stride=s, padding=1))
    # torch flattens (C, 7, 7) C-major; the converter permutes the fc1
    # weight columns to the JAX model's (7, 7, C) order
    y = y.reshape(R, -1)
    y = TF.relu(y @ _t(sd, f"{ih}maskiou_fc1.weight").t()
                + _t(sd, f"{ih}maskiou_fc1.bias"))
    y = TF.relu(y @ _t(sd, f"{ih}maskiou_fc2.weight").t()
                + _t(sd, f"{ih}maskiou_fc2.bias"))
    iou = y @ _t(sd, f"{ih}maskiou.weight").t() + _t(sd, f"{ih}maskiou.bias")
    mask_scores = scores * iou[np.arange(R), classes].numpy()
    return mask_probs.numpy(), mask_scores


def test_full_model_torch_parity():
    from centermask2_tpu.checkpoint.convert_torch import (convert_checkpoint,
                                                          merge_params)
    from centermask2_tpu.models import CenterMask

    rng = np.random.RandomState(42)
    sd = _make_state_dict(rng)

    # RECT canvas (128, 160): the flagship cross-framework parity also
    # pins the tight-compute serving shape class — location grids, FPN
    # ceil shapes, ROI area-ratio assignment (img_area = H*W), and the
    # whole mask branch must agree with torch on a non-square canvas
    img = (rng.rand(128, CANVAS, 3).astype(np.float32) * 255.0
           - np.asarray([103.53, 116.28, 123.675], np.float32))
    xt = torch.from_numpy(img).permute(2, 0, 1)[None]

    # ---- torch forward
    with torch.no_grad():
        stages = _torch_backbone(xt, sd)
        fpn = _torch_fpn(stages, sd)
        logits, regs, ctrs = _torch_fcos_head(fpn, sd)
        t_boxes, t_scores, t_classes, t_locs, n_cand = _np_decode(
            logits, regs, ctrs)
        assert len(t_boxes) > 3, "test needs detections to be meaningful"
        assert n_cand < 3000, "candidate count must stay below the caps"
        t_masks, t_mask_scores = _torch_roi_branch(
            fpn, sd, t_boxes, t_classes, t_scores,
            img_area=float(128 * CANVAS))

    # ---- JAX model from the converted checkpoint
    model = CenterMask(
        conv_body="V-19-slim-eSE", num_classes=NUM_CLASSES,
        mask_on=True, maskiou_on=True,
        pre_nms_topk_test=4096, nms_candidates=4096,
        post_nms_topk_test=POST_NMS_TOPK, dtype=jnp.float32)
    x = jnp.asarray(img[None])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    converted, report = convert_checkpoint(sd, conv_body="V-19-slim-eSE")
    params, missing = merge_params(
        jax.tree.map(np.asarray, variables["params"]), converted)
    assert not missing, f"converter left params uninitialized: {missing[:8]}"
    out = jax.jit(lambda v, im: model.apply(v, im))(
        {"params": jax.tree.map(jnp.asarray, params)}, x)

    valid = np.asarray(out.valid[0])
    n = int(valid.sum())
    assert n == len(t_boxes), (n, len(t_boxes))
    j_boxes = np.asarray(out.pred_boxes[0])[:n]
    j_scores = np.asarray(out.scores[0])[:n]
    j_classes = np.asarray(out.pred_classes[0])[:n]
    j_locs = np.asarray(out.locations[0])[:n]
    j_masks = np.asarray(out.pred_masks[0])[:n, 0]
    j_mask_scores = np.asarray(out.mask_scores[0])[:n]

    np.testing.assert_array_equal(j_classes, t_classes)
    np.testing.assert_allclose(j_locs, t_locs, atol=1e-3)
    np.testing.assert_allclose(j_scores, t_scores, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(j_boxes, t_boxes, rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(j_masks, t_masks, atol=2e-3)
    np.testing.assert_allclose(j_mask_scores, t_mask_scores,
                               rtol=2e-3, atol=2e-3)


def test_full_model_torch_parity_resnet():
    """Same cross-framework ladder on the SECOND backbone family: a
    complete torch ResNet-50 CenterMask whose detectron2-schema
    state_dict goes through convert_checkpoint(backbone='resnet') and
    must reproduce the JAX model's final outputs — exercises the resnet
    converter path and FPN wiring the vovnet e2e test cannot."""
    from centermask2_tpu.checkpoint.convert_torch import (convert_checkpoint,
                                                          merge_params)
    from centermask2_tpu.models import CenterMask

    rng = np.random.RandomState(7)
    sd = _make_resnet_state_dict(rng)

    img = (rng.rand(CANVAS, CANVAS, 3).astype(np.float32) * 255.0
           - np.asarray([103.53, 116.28, 123.675], np.float32))
    xt = torch.from_numpy(img).permute(2, 0, 1)[None]

    with torch.no_grad():
        stages = _torch_resnet(xt, sd)
        fpn = _torch_fpn(stages, sd)
        logits, regs, ctrs = _torch_fcos_head(fpn, sd)
        t_boxes, t_scores, t_classes, t_locs, n_cand = _np_decode(
            logits, regs, ctrs)
        assert len(t_boxes) > 3, "test needs detections to be meaningful"
        assert n_cand < 3000, "candidate count must stay below the caps"
        t_masks, t_mask_scores = _torch_roi_branch(
            fpn, sd, t_boxes, t_classes, t_scores)

    model = CenterMask(
        backbone_type="resnet", resnet_depth=50,
        resnet_stem_out_channels=RN_STEM,
        resnet_res2_out_channels=RN_RES2_OUT,
        resnet_width_per_group=RN_WIDTH,
        fpn_in_features=("res3", "res4", "res5"),
        num_classes=NUM_CLASSES, mask_on=True, maskiou_on=True,
        pre_nms_topk_test=4096, nms_candidates=4096,
        post_nms_topk_test=POST_NMS_TOPK, dtype=jnp.float32)
    x = jnp.asarray(img[None])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    converted, report = convert_checkpoint(sd, backbone="resnet",
                                           resnet_depth=50)
    params, missing = merge_params(
        jax.tree.map(np.asarray, variables["params"]), converted)
    assert not missing, f"converter left params uninitialized: {missing[:8]}"
    assert report["unused_torch_keys"] == []
    out = jax.jit(lambda v, im: model.apply(v, im))(
        {"params": jax.tree.map(jnp.asarray, params)}, x)

    valid = np.asarray(out.valid[0])
    n = int(valid.sum())
    assert n == len(t_boxes), (n, len(t_boxes))
    j_boxes = np.asarray(out.pred_boxes[0])[:n]
    j_scores = np.asarray(out.scores[0])[:n]
    j_classes = np.asarray(out.pred_classes[0])[:n]
    j_masks = np.asarray(out.pred_masks[0])[:n, 0]
    j_mask_scores = np.asarray(out.mask_scores[0])[:n]

    np.testing.assert_array_equal(j_classes, t_classes)
    np.testing.assert_allclose(j_scores, t_scores, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(j_boxes, t_boxes, rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(j_masks, t_masks, atol=2e-3)
    np.testing.assert_allclose(j_mask_scores, t_mask_scores,
                               rtol=2e-3, atol=2e-3)


# Narrow V-39-shaped spec: same STRUCTURE as VoVNet39_eSE —
# block_per_stage [1, 1, 2, 2], so stages 4/5 cross the OSA
# identity-residual add (reference vovnet.py:310-332) and the converter
# must map the OSA{4,5}_2 key sections — at test widths.
V39_MINI = dict(
    stem=[16, 16, 32], stage_conv_ch=[16, 20, 24, 28],
    stage_out_ch=[32, 64, 96, 128], layer_per_block=3,
    block_per_stage=[1, 1, 2, 2], eSE=True, dw=False)


def test_full_model_torch_parity_residual_osa(monkeypatch):
    """Cross-framework e2e on a block_per_stage>1 VoVNet: the OSA
    identity-residual path (V-39/57/99's OSA{4,5}_{2+} modules,
    reference vovnet.py:310-332) and its converter keys cross frameworks.
    The V-19 e2e test cannot reach this path (all its stages are
    single-block); per-module oracles cannot catch residual-wiring or
    key-schema bugs across the whole graph."""
    import centermask2_tpu.models.backbones.vovnet as vovnet_mod
    from centermask2_tpu.checkpoint.convert_torch import (convert_checkpoint,
                                                          merge_params)
    from centermask2_tpu.models import CenterMask

    monkeypatch.setitem(vovnet_mod.STAGE_SPECS, "V-39-mini-eSE", V39_MINI)

    rng = np.random.RandomState(23)
    bps = tuple(V39_MINI["block_per_stage"])
    sd = _make_state_dict(
        rng, stem=V39_MINI["stem"], stage_conv=V39_MINI["stage_conv_ch"],
        stage_out=V39_MINI["stage_out_ch"],
        layer_per_block=V39_MINI["layer_per_block"], block_per_stage=bps)

    img = (rng.rand(CANVAS, CANVAS, 3).astype(np.float32) * 255.0
           - np.asarray([103.53, 116.28, 123.675], np.float32))
    xt = torch.from_numpy(img).permute(2, 0, 1)[None]

    with torch.no_grad():
        stages = _torch_backbone(
            xt, sd, layer_per_block=V39_MINI["layer_per_block"],
            block_per_stage=bps)
        fpn = _torch_fpn(stages, sd)
        logits, regs, ctrs = _torch_fcos_head(fpn, sd)
        t_boxes, t_scores, t_classes, t_locs, n_cand = _np_decode(
            logits, regs, ctrs)
        assert len(t_boxes) > 3, "test needs detections to be meaningful"
        assert n_cand < 3000, "candidate count must stay below the caps"
        t_masks, t_mask_scores = _torch_roi_branch(
            fpn, sd, t_boxes, t_classes, t_scores)

    model = CenterMask(
        conv_body="V-39-mini-eSE", num_classes=NUM_CLASSES,
        mask_on=True, maskiou_on=True,
        pre_nms_topk_test=4096, nms_candidates=4096,
        post_nms_topk_test=POST_NMS_TOPK, dtype=jnp.float32)
    x = jnp.asarray(img[None])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    converted, report = convert_checkpoint(sd, conv_body="V-39-mini-eSE")
    params, missing = merge_params(
        jax.tree.map(np.asarray, variables["params"]), converted)
    assert not missing, f"converter left params uninitialized: {missing[:8]}"
    # the OSA*_2 residual-block keys must actually have been consumed
    assert report["unused_torch_keys"] == []
    out = jax.jit(lambda v, im: model.apply(v, im))(
        {"params": jax.tree.map(jnp.asarray, params)}, x)

    valid = np.asarray(out.valid[0])
    n = int(valid.sum())
    assert n == len(t_boxes), (n, len(t_boxes))
    j_boxes = np.asarray(out.pred_boxes[0])[:n]
    j_scores = np.asarray(out.scores[0])[:n]
    j_classes = np.asarray(out.pred_classes[0])[:n]
    j_masks = np.asarray(out.pred_masks[0])[:n, 0]
    j_mask_scores = np.asarray(out.mask_scores[0])[:n]

    np.testing.assert_array_equal(j_classes, t_classes)
    np.testing.assert_allclose(j_scores, t_scores, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(j_boxes, t_boxes, rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(j_masks, t_masks, atol=2e-3)
    np.testing.assert_allclose(j_mask_scores, t_mask_scores,
                               rtol=2e-3, atol=2e-3)


def _box_iou_matrix(a, b):
    """IoU between two (N, 4) / (M, 4) xyxy box sets."""
    ix0 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy0 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix1 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy1 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter,
                              1e-9)


def test_bf16_inference_drift_vs_f32():
    """The SHIPPED numeric path: every deployment config runs
    dtype=bfloat16, while all cross-framework oracles force f32. Run the
    same converted checkpoint through the full inference graph in both
    dtypes and bound the drift on the final boxes/scores/masks — pinning
    the class of silent dtype bugs (e.g. the round-3 FCOS-head f32
    promotion) that per-module f32 oracles can never see."""
    from centermask2_tpu.checkpoint.convert_torch import (convert_checkpoint,
                                                          merge_params)
    from centermask2_tpu.models import CenterMask

    rng = np.random.RandomState(42)
    sd = _make_state_dict(rng)
    img = (rng.rand(CANVAS, CANVAS, 3).astype(np.float32) * 255.0
           - np.asarray([103.53, 116.28, 123.675], np.float32))
    x = jnp.asarray(img[None])

    outs = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        model = CenterMask(
            conv_body="V-19-slim-eSE", num_classes=NUM_CLASSES,
            mask_on=True, maskiou_on=True,
            pre_nms_topk_test=4096, nms_candidates=4096,
            post_nms_topk_test=POST_NMS_TOPK, dtype=dtype)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        converted, _ = convert_checkpoint(sd, conv_body="V-19-slim-eSE")
        params, missing = merge_params(
            jax.tree.map(np.asarray, variables["params"]), converted)
        assert not missing
        out = jax.jit(lambda v, im: model.apply(v, im))(
            {"params": jax.tree.map(jnp.asarray, params)}, x)
        n = int(np.asarray(out.valid[0]).sum())
        outs[jnp.dtype(dtype).name] = dict(
            boxes=np.asarray(out.pred_boxes[0], np.float32)[:n],
            scores=np.asarray(out.scores[0], np.float32)[:n],
            classes=np.asarray(out.pred_classes[0])[:n],
            masks=np.asarray(out.pred_masks[0], np.float32)[:n, 0],
            mask_scores=np.asarray(out.mask_scores[0], np.float32)[:n])

    f32, bf16 = outs["float32"], outs["bfloat16"]
    n32, n16 = len(f32["scores"]), len(bf16["scores"])
    assert n32 > 3
    # detection count: bf16 may flip borderline pre-NMS candidates, not
    # wipe out (or hallucinate) whole detection sets
    assert abs(n32 - n16) <= max(2, int(0.25 * n32)), (n32, n16)

    # greedy same-class IoU matching f32 -> bf16
    iou = _box_iou_matrix(f32["boxes"], bf16["boxes"])
    iou[f32["classes"][:, None] != bf16["classes"][None, :]] = 0.0
    taken = np.zeros(n16, bool)
    matches = []
    for i in np.argsort(-f32["scores"]):
        j = int(np.argmax(np.where(taken, -1.0, iou[i])))
        if iou[i, j] >= 0.75 and not taken[j]:
            taken[j] = True
            matches.append((i, j))
    assert len(matches) >= 0.75 * n32, (len(matches), n32)

    mi = np.asarray([m[0] for m in matches])
    mj = np.asarray([m[1] for m in matches])
    # score drift: bf16 has ~3 decimal digits; the pipeline compounds
    # ~hundreds of convs, so allow 3e-2 absolute on final scores
    assert np.abs(f32["scores"][mi] - bf16["scores"][mj]).max() < 3e-2
    # mask_scores: score * maskiou, and the maskiou head is an UNBOUNDED
    # linear regressor — with random test weights its output spans ~±15
    # (trained checkpoints live in [0,1]), so bf16 drift scales with the
    # output range, not an absolute epsilon. Bound drift relative to the
    # observed range and require the ranking signal to survive.
    ms32 = f32["mask_scores"][mi]
    ms16 = bf16["mask_scores"][mj]
    ms_range = max(float(ms32.max() - ms32.min()), 1.0)
    assert np.abs(ms32 - ms16).max() < 0.15 * ms_range
    assert np.corrcoef(ms32, ms16)[0, 1] > 0.98
    # box drift: bounded in units of box size
    wh = np.maximum(f32["boxes"][mi, 2:] - f32["boxes"][mi, :2], 1.0)
    rel = np.abs(f32["boxes"][mi] - bf16["boxes"][mj]) / np.tile(wh, 2)
    assert rel.max() < 0.15, rel.max()
    # mask probability field: mean drift tight, pointwise loose
    dm = np.abs(f32["masks"][mi] - bf16["masks"][mj])
    assert dm.mean() < 0.02, dm.mean()
    assert (dm > 0.25).mean() < 0.05


KP_CONV = 64
KP_K = 17


def test_full_model_torch_parity_keypoint():
    """Third branch of the cross-framework ladder: KEYPOINT_ON. A torch
    KRCNN head (8 convs + deconv4x4/s2 + bilinear x2, detectron2 key
    schema) on the same torch backbone/FCOS must reproduce the JAX
    model's keypoint heatmap logits (captured via flax intermediates)
    and its decoded keypoints to one native heatmap cell."""
    from centermask2_tpu.checkpoint.convert_torch import (convert_checkpoint,
                                                          merge_params)
    from centermask2_tpu.models import CenterMask
    from centermask2_tpu.models.roi.keypoint_head import heatmaps_to_keypoints

    rng = np.random.RandomState(13)
    sd = _make_state_dict(rng)
    # drop the (unused) mask/maskiou sections; add the keypoint head
    sd = {k: v for k, v in sd.items() if not k.startswith(
        ("roi_heads.mask_head.", "roi_heads.maskiou_head."))}
    conv, bn, gn, linear = _sd_builders(sd, rng)
    kh = "roi_heads.keypoint_head."
    ch = 256
    for k in range(1, 9):
        conv(f"{kh}conv_fcn{k}", ch, KP_CONV, k=3, bias=True)
        ch = KP_CONV
    sd[f"{kh}score_lowres.weight"] = (
        rng.randn(KP_CONV, KP_K, 4, 4).astype(np.float32) * 0.05)
    sd[f"{kh}score_lowres.bias"] = rng.randn(KP_K).astype(np.float32) * 0.05

    img = (rng.rand(CANVAS, CANVAS, 3).astype(np.float32) * 255.0
           - np.asarray([103.53, 116.28, 123.675], np.float32))
    xt = torch.from_numpy(img).permute(2, 0, 1)[None]

    with torch.no_grad():
        stages = _torch_backbone(xt, sd)
        fpn = _torch_fpn(stages, sd)
        logits, regs, ctrs = _torch_fcos_head(fpn, sd)
        t_boxes, t_scores, t_classes, t_locs, n_cand = _np_decode(
            logits, regs, ctrs)
        assert len(t_boxes) > 3
        x = torch.from_numpy(_torch_pool(fpn, t_boxes)).permute(0, 3, 1, 2)
        for k in range(1, 9):
            x = TF.relu(TF.conv2d(x, _t(sd, f"{kh}conv_fcn{k}.weight"),
                                  _t(sd, f"{kh}conv_fcn{k}.bias"), padding=1))
        x = TF.conv_transpose2d(x, _t(sd, f"{kh}score_lowres.weight"),
                                _t(sd, f"{kh}score_lowres.bias"),
                                stride=2, padding=1)
        t_kp_logits = TF.interpolate(
            x, scale_factor=2, mode="bilinear",
            align_corners=False).permute(0, 2, 3, 1).numpy()  # (R,56,56,K)

    model = CenterMask(
        conv_body="V-19-slim-eSE", num_classes=NUM_CLASSES,
        mask_on=False, maskiou_on=False, keypoint_on=True,
        num_keypoints=KP_K, keypoint_conv_dims=(KP_CONV,) * 8,
        pre_nms_topk_test=4096, nms_candidates=4096,
        post_nms_topk_test=POST_NMS_TOPK, dtype=jnp.float32)
    x_j = jnp.asarray(img[None])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_j)
    converted, _ = convert_checkpoint(sd, conv_body="V-19-slim-eSE",
                                      keypoint_num_conv=8)
    params, missing = merge_params(
        jax.tree.map(np.asarray, variables["params"]), converted)
    assert not missing, f"converter left params uninitialized: {missing[:8]}"
    v = {"params": jax.tree.map(jnp.asarray, params)}
    out, inter = model.apply(
        v, x_j,
        capture_intermediates=lambda m, name: "keypoint_head"
        in (getattr(m, "name", None) or ""))

    valid = np.asarray(out.valid[0])
    n = int(valid.sum())
    assert n == len(t_boxes), (n, len(t_boxes))

    # heatmap logits: the strong converter/wiring assertion
    (j_kp_logits,) = jax.tree.leaves(
        inter["intermediates"]["roi_heads"]["keypoint_head"])
    j_kp_logits = np.asarray(j_kp_logits)[:n]
    np.testing.assert_allclose(j_kp_logits, t_kp_logits, atol=2e-3)

    # decoded keypoints: same decoder on both heatmaps -> one-cell agree
    j_kp = np.asarray(out.pred_keypoints[0])[:n]  # (n, K, 3)
    t_dec = np.asarray(heatmaps_to_keypoints(
        jnp.asarray(t_kp_logits), jnp.asarray(t_boxes)))  # (n, K, 4)
    w = t_boxes[:, 2] - t_boxes[:, 0]
    h = t_boxes[:, 3] - t_boxes[:, 1]
    tol_x = (w / 56 + 1e-2)[:, None]
    tol_y = (h / 56 + 1e-2)[:, None]
    assert (np.abs(j_kp[..., 0] - t_dec[..., 0]) <= tol_x).mean() > 0.97
    assert (np.abs(j_kp[..., 1] - t_dec[..., 1]) <= tol_y).mean() > 0.97
