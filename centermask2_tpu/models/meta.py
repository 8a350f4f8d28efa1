"""CenterMask meta-architecture: backbone -> FPN -> FCOS -> ROI heads.

The TPU equivalent of the reference's export-mode GeneralizedRCNN
(reference: modified_class.py:27-40): tensor in (padded NHWC batch),
fixed-capacity tensors out, matching the 6-tensor contract
(locations, mask_scores, pred_boxes, pred_classes, pred_masks, scores)
of deploy_utils.py:117-126 plus an explicit validity mask.

Training (`loss` method) reproduces the stock detectron2 training branch
the reference relies on (SURVEY.md §3.4): FCOS losses + proposal
sampling + mask/maskiou losses — re-derived in masked fixed-shape form.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from centermask2_tpu.config import CfgNode
from centermask2_tpu.models.backbones import FPN, MobileNetV2, ResNet, VoVNet
from centermask2_tpu.models.backbones import vovnet as vovnet_lib
from centermask2_tpu.models.backbones.resnet import RESNET_FEATURE_STRIDES
from centermask2_tpu.models.fcos import (
    FCOSHead,
    assign_targets_single_image,
    compute_locations,
    decode_batch,
    fcos_losses,
    level_metadata,
)
from centermask2_tpu.models.roi import (
    CenterROIHeads,
    label_and_sample_proposals,
    mask_iou_loss,
)
from centermask2_tpu.ops import masked_topk


class InferenceOutputs(NamedTuple):
    """Batched fixed-capacity outputs; the first six fields mirror
    single_flatten_to_tuple (deploy_utils.py:117-126)."""

    locations: jnp.ndarray  # (B, K, 2)
    mask_scores: jnp.ndarray  # (B, K)
    pred_boxes: jnp.ndarray  # (B, K, 4)
    pred_classes: jnp.ndarray  # (B, K) int32
    pred_masks: jnp.ndarray  # (B, K, 1, 2M, 2M)
    scores: jnp.ndarray  # (B, K)
    valid: jnp.ndarray  # (B, K) bool
    pred_keypoints: Optional[jnp.ndarray] = None  # (B, K, 17, 3) if keypoint_on


class GroundTruth(NamedTuple):
    """Padded per-batch training targets (host pipeline output)."""

    boxes: jnp.ndarray  # (B, G, 4) xyxy in network input coords
    classes: jnp.ndarray  # (B, G) int32
    valid: jnp.ndarray  # (B, G) bool
    mask_patches: jnp.ndarray  # (B, G, P, P) float {0,1}, rasterized on gt box
    keypoints: Optional[jnp.ndarray] = None  # (B, G, 17, 3) x, y, vis
    image_sizes: Optional[jnp.ndarray] = None  # (B, 2) true (h, w) pre-pad


class CenterMask(nn.Module):
    # backbone
    backbone_type: str = "vovnet"  # "vovnet" | "mobilenet" | "resnet"
    conv_body: str = "V-39-eSE"
    resnet_depth: int = 50
    resnet_norm: str = "FrozenBN"
    resnet_num_groups: int = 1
    resnet_width_per_group: int = 64
    resnet_stride_in_1x1: bool = True
    resnet_res5_dilation: int = 1
    resnet_res2_out_channels: int = 256
    resnet_stem_out_channels: int = 64
    backbone_norm: str = "FrozenBN"
    fpn_in_features: Sequence[str] = ("stage3", "stage4", "stage5")
    fpn_out_channels: int = 256
    fpn_norm: str = ""
    fpn_fuse_type: str = "sum"
    top_levels: int = 2
    # fcos
    num_classes: int = 80
    fcos_in_features: Sequence[str] = ("p3", "p4", "p5", "p6", "p7")
    fpn_strides: Sequence[int] = (8, 16, 32, 64, 128)
    fcos_norm: str = "GN"
    num_cls_convs: int = 4
    num_box_convs: int = 4
    num_share_convs: int = 0
    use_scale: bool = True
    prior_prob: float = 0.01
    use_deformable: bool = False
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    with_modulated_dcn: bool = False
    sizes_of_interest: Sequence[int] = (64, 128, 256, 512)
    center_sample: bool = True
    pos_radius: float = 1.5
    loc_loss_type: str = "giou"
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    thresh_with_ctr: bool = False
    # decode caps
    pre_nms_thresh_test: float = 0.05
    pre_nms_topk_test: int = 1000
    post_nms_topk_test: int = 50
    pre_nms_thresh_train: float = 0.05
    pre_nms_topk_train: int = 1000
    post_nms_topk_train: int = 100
    nms_thresh: float = 0.6
    nms_candidates: int = 1000
    # approximate decode top-k (recall 0.95 tail). Off: after the f32
    # sort-key + fusion-barrier decode rewrite, exact top_k measures
    # FASTER than approx_max_k at these shapes (6.7-7.4 vs 8.7 ms/img
    # e2e on v5e) AND matches reference numerics — the r1 "approx is
    # faster" result is stale. Kept as a flag for other shapes/stacks.
    approx_topk: bool = False
    # roi
    mask_on: bool = True
    maskiou_on: bool = True
    maskiou_loss_weight: float = 1.0
    keypoint_on: bool = False
    roi_in_features: Sequence[str] = ("p3", "p4", "p5")
    roi_in_strides: Sequence[int] = (8, 16, 32)
    assign_criterion: str = "ratio"
    pooler_resolution: int = 14
    pooler_sampling_ratio: int = 2  # 0 = adaptive (bucketed), d2 default
    mask_norm: str = ""
    cls_agnostic_mask: bool = False
    mask_conv_dim: int = 256
    mask_num_conv: int = 4
    maskiou_conv_dim: int = 256
    maskiou_num_conv: int = 4
    num_keypoints: int = 17
    keypoint_conv_dims: Sequence[int] = (512,) * 8
    # reference BaseKeypointRCNNHead (keypoint_head.py:126-133): loss
    # scale + normalizer choice (visible count vs fixed per-image count)
    keypoint_loss_weight: float = 1.0
    keypoint_normalize_by_visible: bool = True
    deformable_groups: int = 1
    # training capacities
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    max_fg_proposals: int = 128
    # proposal matching (reference center_heads.py:125-135)
    roi_iou_thresholds: Sequence[float] = (0.5,)
    roi_iou_labels: Sequence[int] = (0, 1)
    proposal_append_gt: bool = True
    # input layout: images are host space-to-depth'd (B, H/4+1, W/4+1, 48)
    # via data/preprocess.py:stem_space_to_depth (vovnet, non-dw only).
    # Inference additionally accepts this layout as RAW uint8 (packed by
    # data/preprocess.py:s2d_pack_u8, normalization done on device) —
    # 4x less host->device traffic per image, bit-identical outputs.
    s2d_input: bool = False
    # BGR mean for on-device normalization of uint8 inputs
    # (MODEL.PIXEL_MEAN; host f32 preprocessing uses the same constants)
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    # rematerialize the backbone in the backward pass (jax.checkpoint):
    # trades ~15% extra forward FLOPs for dropping every backbone
    # activation from HBM — the multi-scale 3x recipe at 1344 keeps
    # ~1.4 GB of stem/OSA activations per image otherwise (TPU.REMAT_BACKBONE)
    remat_backbone: bool = False
    # compute
    dtype: Any = jnp.bfloat16

    def setup(self):
        def maybe_remat(cls):
            return nn.remat(cls) if self.remat_backbone else cls

        if self.backbone_type == "mobilenet":
            self.backbone = maybe_remat(MobileNetV2)(
                out_features=tuple(self.fpn_in_features), dtype=self.dtype)
        elif self.backbone_type == "resnet":
            # reference build_fcos_resnet_fpn_backbone (fpn.py:56-87)
            self.backbone = maybe_remat(ResNet)(
                depth=self.resnet_depth,
                out_features=tuple(self.fpn_in_features),
                norm=self.resnet_norm,
                num_groups=self.resnet_num_groups,
                width_per_group=self.resnet_width_per_group,
                stride_in_1x1=self.resnet_stride_in_1x1,
                res5_dilation=self.resnet_res5_dilation,
                res2_out_channels=self.resnet_res2_out_channels,
                stem_out_channels=self.resnet_stem_out_channels,
                dtype=self.dtype)
        else:
            self.backbone = maybe_remat(VoVNet)(
                body=self.conv_body, out_features=tuple(self.fpn_in_features),
                norm=self.backbone_norm,
                stage_with_dcn=tuple(self.stage_with_dcn),
                with_modulated_dcn=self.with_modulated_dcn,
                deformable_groups=self.deformable_groups,
                s2d_input=self.s2d_input,
                dtype=self.dtype)
        if self.backbone_type == "vovnet":
            strides_map = vovnet_lib.FEATURE_STRIDES
        else:  # resnet / mobilenet both use res{2..5} naming
            strides_map = RESNET_FEATURE_STRIDES
        in_strides = [strides_map[f] for f in self.fpn_in_features]
        top_block = {2: "p6p7", 1: "p6", 0: None}[self.top_levels]
        self.fpn = FPN(
            in_strides=in_strides, out_channels=self.fpn_out_channels,
            norm=self.fpn_norm, fuse_type=self.fpn_fuse_type,
            top_block=top_block, dtype=self.dtype)
        self.fcos_head = FCOSHead(
            num_classes=self.num_classes, in_channels=self.fpn_out_channels,
            num_cls_convs=self.num_cls_convs, num_box_convs=self.num_box_convs,
            num_share_convs=self.num_share_convs, norm=self.fcos_norm,
            num_levels=len(self.fcos_in_features), use_scale=self.use_scale,
            prior_prob=self.prior_prob, use_deformable=self.use_deformable,
            dtype=self.dtype)
        self.roi_heads = CenterROIHeads(
            num_classes=self.num_classes, in_strides=tuple(self.roi_in_strides),
            mask_on=self.mask_on, maskiou_on=self.maskiou_on,
            keypoint_on=self.keypoint_on,
            assign_criterion=self.assign_criterion,
            pooler_resolution=self.pooler_resolution,
            sampling_ratio=self.pooler_sampling_ratio,
            mask_norm=self.mask_norm, cls_agnostic_mask=self.cls_agnostic_mask,
            mask_conv_dims=self.mask_conv_dim,
            mask_num_conv=self.mask_num_conv,
            maskiou_conv_dims=self.maskiou_conv_dim,
            maskiou_num_conv=self.maskiou_num_conv,
            num_keypoints=self.num_keypoints,
            keypoint_conv_dims=tuple(self.keypoint_conv_dims),
            dtype=self.dtype)

    # ------------------------------------------------------------------
    def features(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """images: (B, H, W, 3) already normalized+padded (BGR - mean)."""
        H, W = self.canvas_hw(images)
        if H % 32 or W % 32:
            raise ValueError(
                f"canvas {H}x{W} must be divisible by 32 (detectron2 "
                "size_divisibility): the FPN top-down 2x upsample "
                "misaligns against ceil-divided lateral shapes otherwise "
                "(check TPU.FIXED_EDGE_SIZE / TPU.SIZE_BUCKETS / the "
                "tight-compute serving canvas)")
        bottom_up = self.backbone(images.astype(self.dtype))
        feats = self.fpn([bottom_up[f] for f in self.fpn_in_features])
        return feats

    def _fcos_raw(self, feats):
        fcos_feats = [feats[f] for f in self.fcos_in_features]
        logits, reg, ctr = self.fcos_head(fcos_feats)
        shapes = [(f.shape[1], f.shape[2]) for f in fcos_feats]
        locations = compute_locations(shapes, self.fpn_strides)
        return locations, logits, reg, ctr

    def _decode(self, locations, logits, reg, ctr, training: bool):
        return decode_batch(
            locations, logits, reg, ctr, self.fpn_strides,
            pre_nms_thresh=(self.pre_nms_thresh_train if training
                            else self.pre_nms_thresh_test),
            pre_nms_topk=(self.pre_nms_topk_train if training
                          else self.pre_nms_topk_test),
            nms_thresh=self.nms_thresh,
            post_nms_topk=(self.post_nms_topk_train if training
                           else self.post_nms_topk_test),
            nms_candidates=self.nms_candidates,
            thresh_with_ctr=self.thresh_with_ctr,
            approx_topk=self.approx_topk,
        )

    # ------------------------------------------------------------------
    def __call__(self, images: jnp.ndarray,
                 image_sizes: Optional[jnp.ndarray] = None,
                 valid_hw: Optional[jnp.ndarray] = None,
                 canvas_hw: Optional[Tuple[int, int]] = None
                 ) -> InferenceOutputs:
        return self.inference(images, image_sizes, valid_hw, canvas_hw)

    def _pad_to_canvas(self, images: jnp.ndarray,
                       canvas_hw: Optional[Tuple[int, int]]) -> jnp.ndarray:
        """Zero-pad a TIGHT s2d input pack (data/preprocess.py:
        s2d_pack_u8_tight) back to the deployment canvas on device.
        Exact: a tight-canvas s2d pack equals the top-left block of the
        full-canvas pack, and every full-pack cell outside it reads only
        zero canvas padding. ``canvas_hw``: static python (H, W) of the
        deployment canvas. Cheap — a u8 HBM copy XLA fuses with the
        normalize that follows."""
        if canvas_hw is None or not self.s2d_input:
            return images
        Ho, Wo = canvas_hw[0] // 4 + 1, canvas_hw[1] // 4 + 1
        dh, dw = Ho - images.shape[1], Wo - images.shape[2]
        if dh == 0 and dw == 0:
            return images
        assert dh >= 0 and dw >= 0, (images.shape, canvas_hw)
        return jnp.pad(images, ((0, 0), (0, dh), (0, dw), (0, 0)))

    def _normalize_u8_s2d(self, images: jnp.ndarray,
                          valid_hw: Optional[jnp.ndarray]) -> jnp.ndarray:
        """On-device normalization for RAW uint8 s2d inputs: cast to f32,
        subtract the BGR mean, and zero everything outside the true
        resized image (the reference zero-pads the normalized canvas,
        deploy_utils.py:85-90 — the u8 canvas's padding bytes are 0, so
        without masking they would read as -mean after subtraction).
        Bit-identical to the host f32 path (u8->f32 is exact; same f32
        subtract). ``valid_hw``: (B, 2) int32 true resized (h, w);
        defaults to the full canvas. Elementwise only — XLA fuses it
        into the stem conv's input."""
        if images.dtype != jnp.uint8:
            return images
        assert self.s2d_input, "uint8 input requires the s2d layout"
        B, Ho, Wo, C16 = images.shape
        C = C16 // 16
        H, W = (Ho - 1) * 4, (Wo - 1) * 4
        if valid_hw is None:
            valid_hw = jnp.tile(jnp.array([[H, W]], jnp.int32), (B, 1))
        # channel rho*4C + kap*C + c holds pixel (4i + rho - 2, 4j + kap - 2)
        rows = 4 * jnp.arange(Ho)[:, None] + jnp.arange(4)[None, :] - 2
        cols = 4 * jnp.arange(Wo)[:, None] + jnp.arange(4)[None, :] - 2
        rvalid = (rows[None] >= 0) & (rows[None] < valid_hw[:, :1, None])
        cvalid = (cols[None] >= 0) & (cols[None] < valid_hw[:, 1:, None])
        x = images.astype(jnp.float32).reshape(B, Ho, Wo, 4, 4, C)
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        mask = (rvalid[:, :, None, :, None, None]
                & cvalid[:, None, :, None, :, None])
        x = jnp.where(mask, x - mean, 0.0)
        return x.reshape(B, Ho, Wo, C16)

    def canvas_hw(self, images: jnp.ndarray) -> Tuple[int, int]:
        """Original padded-canvas (H, W) for an input batch, undoing the
        host s2d layout ((H/4+1, W/4+1) grid) when s2d_input is set."""
        H, W = images.shape[1], images.shape[2]
        if self.s2d_input:
            H, W = (H - 1) * 4, (W - 1) * 4
        return H, W

    def inference(self, images: jnp.ndarray,
                  image_sizes: Optional[jnp.ndarray] = None,
                  valid_hw: Optional[jnp.ndarray] = None,
                  canvas_hw: Optional[Tuple[int, int]] = None
                  ) -> InferenceOutputs:
        """Full inference to the 6-tensor contract. ``image_sizes``: (B, 2)
        true (h, w) per image (defaults to the padded size, matching the
        reference's FakeImageList deployment contract). ``valid_hw``:
        (B, 2) int32 true resized sizes, only needed for RAW uint8 s2d
        inputs (on-device normalization masking — see _normalize_u8_s2d);
        it does NOT change box/ROI semantics (image_sizes does that).
        ``canvas_hw``: static deployment canvas (H, W) — pass it when
        ``images`` is a TIGHT s2d pack so the device zero-pads it back
        to the full canvas (see _pad_to_canvas)."""
        images = self._pad_to_canvas(images, canvas_hw)
        B = images.shape[0]
        H, W = self.canvas_hw(images)
        if image_sizes is None:
            image_sizes = jnp.tile(jnp.array([[H, W]], jnp.float32), (B, 1))
        images = self._normalize_u8_s2d(images, valid_hw)
        feats = self.features(images)
        locations, logits, reg, ctr = self._fcos_raw(feats)
        proposals = self._decode(locations, logits, reg, ctr, training=False)

        K = proposals.pred_boxes.shape[1]
        flat_boxes = proposals.pred_boxes.reshape(B * K, 4)
        flat_classes = proposals.pred_classes.reshape(B * K)
        flat_valid = proposals.valid.reshape(B * K)
        flat_scores = proposals.scores.reshape(B * K)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), K)
        img_areas = jnp.repeat(image_sizes[:, 0] * image_sizes[:, 1], K)

        roi_features = [feats[f] for f in self.roi_in_features]
        if self.mask_on:
            roi_out = self.roi_heads(
                roi_features, flat_boxes, flat_classes, flat_valid,
                batch_idx, img_areas.astype(jnp.float32), flat_scores)
            masks = roi_out["pred_masks"]
            m = masks.shape[-1]
            pred_masks = masks.reshape(B, K, 1, m, m)
            mask_scores = roi_out["mask_scores"].reshape(B, K)
        else:
            m = 2 * self.pooler_resolution
            pred_masks = jnp.zeros((B, K, 1, m, m), jnp.float32)
            mask_scores = proposals.scores

        pred_keypoints = None
        if self.keypoint_on:
            from centermask2_tpu.models.roi import keypoint_rcnn_inference

            kp_logits = self.roi_heads.keypoint_forward(
                roi_features, flat_boxes, batch_idx,
                img_areas.astype(jnp.float32))
            kp = keypoint_rcnn_inference(kp_logits, flat_boxes)
            pred_keypoints = kp.reshape(B, K, -1, 3)

        boxes_out = jnp.where(proposals.valid[..., None], proposals.pred_boxes, 0.0)
        return InferenceOutputs(
            locations=proposals.locations,
            mask_scores=mask_scores,
            pred_boxes=boxes_out,
            pred_classes=proposals.pred_classes,
            pred_masks=pred_masks,
            scores=proposals.scores,
            valid=proposals.valid,
            pred_keypoints=pred_keypoints,
        )

    def inference_batched(self, images: jnp.ndarray,
                          image_sizes: Optional[jnp.ndarray] = None,
                          valid_hw: Optional[jnp.ndarray] = None
                          ) -> InferenceOutputs:
        """Batched serving by mapping the single-image program over the
        batch (one compile, sequential execution).

        Rationale: at batch > 1 XLA's TPU conv-layout choices regress —
        fusion stops around elementwise ops and relayout copies appear
        (measured 16.3 ms/img at B=4 vs 9.2 ms/img single in the first
        round-2 profile; re-measured 15.4 vs 8.9 after the eSE
        dense-gate and ROI-pool rewrites, so the regression is the conv
        layouts themselves; re-measured AGAIN at the r4 tight canvas:
        7.13 ms/img at B=2/800x1088 vs 5.60 single — holds at every
        shape class tried) — so the fastest batched throughput is the
        optimized B=1 graph run per image under lax.map. For multi-chip
        throughput, shard the batch instead (parallel/serve.py).

        ``valid_hw``: (B, 2) int32 true resized sizes, needed only for
        RAW uint8 s2d inputs (on-device normalization masking).
        """
        B = images.shape[0]
        if image_sizes is None:
            H, W = self.canvas_hw(images)
            image_sizes = jnp.tile(jnp.array([[H, W]], jnp.float32), (B, 1))
        if valid_hw is None:
            H, W = self.canvas_hw(images)
            valid_hw = jnp.tile(jnp.array([[H, W]], jnp.int32), (B, 1))

        def one(args):
            im, sz, hw = args
            out = self.inference(im[None], sz[None], hw[None])
            return jax.tree.map(lambda x: x[0], out)

        return jax.lax.map(one, (images, image_sizes, valid_hw))

    # ------------------------------------------------------------------
    def loss(self, images: jnp.ndarray, gt: GroundTruth,
             rng: jax.Array, axis_name: Optional[str] = None
             ) -> Dict[str, jnp.ndarray]:
        """Training losses (FCOS + mask + maskiou)."""
        B, H, W, _ = images.shape
        if self.s2d_input:
            H, W = (H - 1) * 4, (W - 1) * 4
        feats = self.features(images)
        locations, logits, reg, ctr = self._fcos_raw(feats)

        # ---- FCOS losses: level-first flattening like the reference
        num_locs = [loc.shape[0] for loc in locations]
        strides_per_loc, ranges_per_loc = level_metadata(
            num_locs, self.fpn_strides, self.sizes_of_interest)
        locs_cat = jnp.concatenate(locations, axis=0)  # (L, 2)

        def assign_one(gt_boxes, gt_classes, gt_valid):
            return assign_targets_single_image(
                locs_cat, strides_per_loc, ranges_per_loc,
                gt_boxes, gt_classes, gt_valid, self.num_classes,
                self.center_sample, self.pos_radius)

        labels, reg_targets = jax.vmap(assign_one)(gt.boxes, gt.classes, gt.valid)
        # normalize reg targets by per-location stride (fcos_outputs.py:229)
        reg_targets = reg_targets / strides_per_loc[None, :, None]

        flat_logits = jnp.concatenate(
            [x.reshape(B, -1, self.num_classes) for x in logits], axis=1
        ).reshape(-1, self.num_classes)
        flat_reg = jnp.concatenate(
            [x.reshape(B, -1, 4) for x in reg], axis=1).reshape(-1, 4)
        flat_ctr = jnp.concatenate(
            [x.reshape(B, -1) for x in ctr], axis=1).reshape(-1)

        losses = fcos_losses(
            labels.reshape(-1), reg_targets.reshape(-1, 4),
            flat_logits, flat_reg, flat_ctr, self.num_classes,
            self.focal_alpha, self.focal_gamma, self.loc_loss_type, axis_name)

        if not (self.mask_on or self.keypoint_on):
            return losses

        # ---- proposals for ROI training (detached: the reference labels and
        # samples proposals under no_grad, center_heads.py:178; boxes act as
        # constants for the mask branch)
        proposals = jax.lax.stop_gradient(
            self._decode(locations, logits, reg, ctr, training=True))

        rngs = jax.random.split(rng, B)

        def sample_one(r, boxes, valid, gt_boxes, gt_classes, gt_valid):
            return label_and_sample_proposals(
                r, boxes, valid, gt_boxes, gt_classes, gt_valid,
                self.num_classes, self.batch_size_per_image,
                self.positive_fraction,
                iou_thresholds=tuple(self.roi_iou_thresholds),
                iou_labels=tuple(self.roi_iou_labels),
                append_gt=self.proposal_append_gt)

        sampled = jax.vmap(sample_one)(
            rngs, proposals.pred_boxes, proposals.valid,
            gt.boxes, gt.classes, gt.valid)

        # ---- foreground selection, capped at max_fg_proposals per image
        F = self.max_fg_proposals
        fg_mask = sampled.valid & (sampled.gt_classes != self.num_classes)

        def take_fg(r):
            idx, v, _ = masked_topk(r.astype(jnp.float32), r, F)
            return idx, v

        fg_idx, fg_valid = jax.vmap(take_fg)(fg_mask)
        fg_boxes = jnp.take_along_axis(sampled.boxes, fg_idx[..., None], axis=1)
        fg_classes = jnp.take_along_axis(sampled.gt_classes, fg_idx, axis=1)
        fg_gt_idx = jnp.take_along_axis(sampled.gt_indices, fg_idx, axis=1)

        flat_fg_boxes = fg_boxes.reshape(B * F, 4)
        flat_fg_valid = fg_valid.reshape(B * F)
        flat_fg_classes = jnp.clip(fg_classes.reshape(B * F), 0,
                                   self.num_classes - 1)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), F)
        # ratio-criterion ROI level assignment uses true per-image areas,
        # matching the inference path and the reference's training-time
        # image sizes (ADVICE round 1); padded canvas only as fallback
        if gt.image_sizes is not None:
            areas = (gt.image_sizes[:, 0] * gt.image_sizes[:, 1])
            img_areas = jnp.repeat(areas.astype(jnp.float32), F)
        else:
            img_areas = jnp.full((B * F,), float(H * W), jnp.float32)

        roi_features = [feats[f] for f in self.roi_in_features]
        if not self.mask_on:
            pooled = mask_logits = None
        else:
            pooled, mask_logits = self.roi_heads.mask_forward_train(
                roi_features, flat_fg_boxes, batch_idx, img_areas)

        if self.mask_on:
            # ---- mask targets from rasterized gt patches
            gt_boxes_of_fg = jnp.take_along_axis(
                gt.boxes, fg_gt_idx[..., None], axis=1).reshape(B * F, 4)
            patch_dim = gt.mask_patches.shape[-1]
            # row gather over flattened (B*G, P*P) patches: a
            # take_along_axis with broadcast trailing dims lowers to a
            # per-ELEMENT gather (profiled 1.9 ms/step at B=2, F=128 on
            # v5e); contiguous-row jnp.take is the fast TPU gather form
            G_cap = gt.mask_patches.shape[1]
            # clamp per image BEFORE the row offset (take_along_axis
            # semantics) so a padded index can't read a neighbor image
            row_idx = (jnp.clip(fg_gt_idx.astype(jnp.int32), 0, G_cap - 1)
                       + jnp.arange(B, dtype=jnp.int32)[:, None] * G_cap
                       ).reshape(B * F)
            patches_of_fg = jnp.take(
                gt.mask_patches.reshape(B * G_cap, patch_dim * patch_dim),
                row_idx, axis=0,
            ).reshape(B * F, patch_dim, patch_dim)

            m_side = 2 * self.pooler_resolution
            gt_mask_targets = crop_and_resize_patches(
                patches_of_fg, gt_boxes_of_fg, flat_fg_boxes, m_side)
            gt_mask_bool = gt_mask_targets >= 0.5

            # per-class logit selection (mask_head.py:121-127) as a
            # one-hot contraction: take_along_axis with broadcast
            # spatial dims lowers to a per-element gather (1.9 ms fwd +
            # 1.1 ms bwd at R=256 on v5e); the einsum runs on the MXU
            # and its transpose is another matmul, not a scatter
            sel_logits = jnp.einsum(
                "rhwc,rc->rhw", mask_logits.astype(jnp.float32),
                jax.nn.one_hot(flat_fg_classes, mask_logits.shape[-1],
                               dtype=jnp.float32))

            from centermask2_tpu.ops import optax_sigmoid_bce

            vmaskf = flat_fg_valid.astype(jnp.float32)[:, None, None]
            n_el = jnp.maximum(jnp.sum(vmaskf) * m_side * m_side, 1.0)
            mask_loss = jnp.sum(
                optax_sigmoid_bce(sel_logits, gt_mask_bool.astype(jnp.float32))
                * vmaskf) / n_el
            losses["loss_mask"] = mask_loss

            if self.maskiou_on:
                # maskiou targets (mask_head.py:150-165): ratio-corrected IoU of
                # binarized prediction vs full gt mask
                pred_bin = sel_logits > 0.0
                inter = jnp.sum((pred_bin & gt_mask_bool).astype(jnp.float32),
                                axis=(1, 2))
                # mask_ratios: |gt inside proposal| / |full gt|
                full_area = jnp.sum(patches_of_fg, axis=(1, 2))
                inside = _patch_fraction_inside(
                    patches_of_fg, gt_boxes_of_fg, flat_fg_boxes)
                ratio = jnp.clip(inside / jnp.maximum(full_area, 1e-6), 0.0, 1.0)
                ratio = jnp.maximum(ratio, 1e-10)
                gt_area_28 = jnp.sum(gt_mask_bool.astype(jnp.float32), axis=(1, 2))
                full_area_28 = gt_area_28 / ratio
                union = jnp.sum(pred_bin.astype(jnp.float32), axis=(1, 2)) \
                    + full_area_28 - inter
                maskiou_targets = inter / jnp.maximum(union, 1.0)

                sel_mask = jax.nn.sigmoid(sel_logits)[..., None]
                pred_maskiou = self.roi_heads.maskiou_forward(pooled, sel_mask)
                losses["loss_maskiou"] = mask_iou_loss(
                    flat_fg_classes, pred_maskiou.astype(jnp.float32),
                    jax.lax.stop_gradient(maskiou_targets), flat_fg_valid,
                    self.maskiou_loss_weight)

        if self.keypoint_on and gt.keypoints is not None:
            from centermask2_tpu.models.roi.keypoint_head import (
                keypoint_rcnn_loss,
                keypoints_to_heatmap,
            )

            K = gt.keypoints.shape[2]
            kp_of_fg = jnp.take_along_axis(
                gt.keypoints, fg_gt_idx[..., None, None].astype(jnp.int32),
                axis=1).reshape(B * F, K, 3)
            kp_logits = self.roi_heads.keypoint_forward(
                roi_features, flat_fg_boxes, batch_idx, img_areas)
            S = kp_logits.shape[1]
            heat_idx, kp_valid = keypoints_to_heatmap(kp_of_fg, flat_fg_boxes, S)
            kp_valid = kp_valid & flat_fg_valid[:, None]
            # reference keypoint_head.py:149-161: normalize by visible
            # keypoints, or by num_images * K * batch_size * pos_fraction
            normalizer = None
            if not self.keypoint_normalize_by_visible:
                normalizer = float(
                    B * self.num_keypoints * self.batch_size_per_image
                    * self.positive_fraction)
            losses["loss_keypoint"] = self.keypoint_loss_weight * \
                keypoint_rcnn_loss(
                    kp_logits.astype(jnp.float32), heat_idx, kp_valid,
                    normalizer=normalizer)
        return losses


def _resample_matrix(coords: jnp.ndarray, size: int, s: int) -> jnp.ndarray:
    """(R, out*s) 1-D ROIAlign sample coords -> (R, out, size) weight
    matrix folding the bilinear taps AND the s-subsample average, with
    ops/roi_align.py:_bilinear_taps border semantics (zero outside
    [-1, size], taps clamped to [0, size-1])."""
    in_r = (coords >= -1.0) & (coords <= size)
    c = jnp.minimum(jnp.clip(coords, 0.0), size - 1.0)
    low = jnp.minimum(jnp.floor(c), size - 1.0)
    frac = c - low
    high = jnp.minimum(low + 1.0, size - 1.0)
    j = jnp.arange(size, dtype=jnp.float32)
    w = ((1.0 - frac)[..., None] * (j == low[..., None])
         + frac[..., None] * (j == high[..., None]))
    w = w * in_r[..., None]
    R, n = coords.shape
    return w.reshape(R, n // s, s, size).mean(axis=2)


def crop_and_resize_patches(
    patches: jnp.ndarray,  # (R, P, P) gt masks rasterized over gt boxes
    gt_boxes: jnp.ndarray,  # (R, 4) the boxes the patches cover
    proposal_boxes: jnp.ndarray,  # (R, 4)
    out_size: int,
) -> jnp.ndarray:
    """Sample each gt patch at its proposal box -> (R, out, out) floats.

    The TPU replacement for detectron2 crop_and_resize (polygon rasterize
    per proposal, mask_head.py:91-93): masks are pre-rasterized once per gt
    on the host, and proposal-box crops become bilinear resampling on
    device.

    Formulated as SEPARABLE interpolation — out = Ay @ patch @ Ax^T per
    ROI, two batched (out, P)x(P, P) matmuls — because bilinear weights
    factor per axis (including the in-range mask and the 2x2 subsample
    average). The direct formulation (vmapped roi_align per patch) lowers
    to a per-ROI scalar gather XLA runs one element at a time: profiled
    32.6 ms/step at (R=256, 28->28x2 grid) on v5e — 29% of the whole
    V-39 train step — vs matmuls that are algebraically identical and
    run on the MXU in ~0.1 ms.
    """
    P = patches.shape[-1]
    gx0, gy0, gx1, gy1 = [gt_boxes[:, i] for i in range(4)]
    sx = P / jnp.maximum(gx1 - gx0, 1e-6)
    sy = P / jnp.maximum(gy1 - gy0, 1e-6)
    # proposal box in patch coords, then aligned sample coords per axis
    # (ops/roi_align.py:_sample_coords with scale=1, aligned=True)
    bx0 = (proposal_boxes[:, 0] - gx0) * sx - 0.5
    by0 = (proposal_boxes[:, 1] - gy0) * sy - 0.5
    bx1 = (proposal_boxes[:, 2] - gx0) * sx - 0.5
    by1 = (proposal_boxes[:, 3] - gy0) * sy - 0.5
    s = 2
    grid = (jnp.arange(out_size * s, dtype=jnp.float32) + 0.5) / s
    ys = by0[:, None] + grid[None, :] * ((by1 - by0) / out_size)[:, None]
    xs = bx0[:, None] + grid[None, :] * ((bx1 - bx0) / out_size)[:, None]
    ay = _resample_matrix(ys, P, s)  # (R, out, P)
    ax = _resample_matrix(xs, P, s)
    t = jnp.einsum("rij,rjk->rik", ay, patches.astype(jnp.float32))
    return jnp.einsum("rik,rlk->ril", t, ax)


def _patch_fraction_inside(patches, gt_boxes, proposal_boxes):
    """Sum of patch mass whose cell centers fall inside the proposal box."""
    R, P, _ = patches.shape
    gx0, gy0, gx1, gy1 = [gt_boxes[:, i] for i in range(4)]
    ys = (jnp.arange(P, dtype=jnp.float32) + 0.5) / P
    xs = ys
    cell_y = gy0[:, None] + ys[None, :] * (gy1 - gy0)[:, None]  # (R, P)
    cell_x = gx0[:, None] + xs[None, :] * (gx1 - gx0)[:, None]
    in_y = (cell_y >= proposal_boxes[:, 1:2]) & (cell_y <= proposal_boxes[:, 3:4])
    in_x = (cell_x >= proposal_boxes[:, 0:1]) & (cell_x <= proposal_boxes[:, 2:3])
    inside = in_y[:, :, None] & in_x[:, None, :]
    return jnp.sum(patches * inside, axis=(1, 2))


def build_centermask(cfg: CfgNode) -> CenterMask:
    """Construct the model from a config (the registry-resolution analog of
    detectron2 build_model for the reference's shipped configs)."""
    backbone_name = cfg.MODEL.BACKBONE.NAME
    if "mobilenet" in backbone_name or cfg.MODEL.MOBILENET:
        backbone_type = "mobilenet"
        fpn_in = tuple(cfg.MODEL.FPN.IN_FEATURES)
    elif "resnet" in backbone_name:
        backbone_type = "resnet"
        fpn_in = tuple(cfg.MODEL.FPN.IN_FEATURES) or \
            tuple(cfg.MODEL.RESNETS.OUT_FEATURES)
    else:
        backbone_type = "vovnet"
        fpn_in = tuple(cfg.MODEL.FPN.IN_FEATURES) or ("stage3", "stage4", "stage5")

    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return CenterMask(
        backbone_type=backbone_type,
        conv_body=cfg.MODEL.VOVNET.CONV_BODY,
        backbone_norm=cfg.MODEL.VOVNET.NORM,
        resnet_depth=cfg.MODEL.RESNETS.DEPTH,
        resnet_norm=cfg.MODEL.RESNETS.NORM,
        resnet_num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        resnet_width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        resnet_stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        resnet_res5_dilation=cfg.MODEL.RESNETS.RES5_DILATION,
        resnet_res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        resnet_stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        fpn_in_features=fpn_in,
        fpn_out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        fpn_norm=cfg.MODEL.FPN.NORM,
        fpn_fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        top_levels=cfg.MODEL.FCOS.TOP_LEVELS,
        num_classes=cfg.MODEL.FCOS.NUM_CLASSES,
        fcos_in_features=tuple(cfg.MODEL.FCOS.IN_FEATURES),
        fpn_strides=tuple(cfg.MODEL.FCOS.FPN_STRIDES),
        fcos_norm=cfg.MODEL.FCOS.NORM,
        num_cls_convs=cfg.MODEL.FCOS.NUM_CLS_CONVS,
        num_box_convs=cfg.MODEL.FCOS.NUM_BOX_CONVS,
        num_share_convs=cfg.MODEL.FCOS.NUM_SHARE_CONVS,
        use_scale=cfg.MODEL.FCOS.USE_SCALE,
        prior_prob=cfg.MODEL.FCOS.PRIOR_PROB,
        sizes_of_interest=tuple(cfg.MODEL.FCOS.SIZES_OF_INTEREST),
        center_sample=cfg.MODEL.FCOS.CENTER_SAMPLE,
        pos_radius=cfg.MODEL.FCOS.POS_RADIUS,
        loc_loss_type=cfg.MODEL.FCOS.LOC_LOSS_TYPE,
        focal_alpha=cfg.MODEL.FCOS.LOSS_ALPHA,
        focal_gamma=cfg.MODEL.FCOS.LOSS_GAMMA,
        thresh_with_ctr=cfg.MODEL.FCOS.THRESH_WITH_CTR,
        use_deformable=cfg.MODEL.FCOS.USE_DEFORMABLE,
        stage_with_dcn=tuple(cfg.MODEL.VOVNET.STAGE_WITH_DCN),
        with_modulated_dcn=cfg.MODEL.VOVNET.WITH_MODULATED_DCN,
        pre_nms_thresh_test=cfg.MODEL.FCOS.INFERENCE_TH_TEST,
        pre_nms_topk_test=cfg.MODEL.FCOS.PRE_NMS_TOPK_TEST,
        # TEST.DETECTIONS_PER_IMAGE is detectron2's detection cap; it
        # binds here when tighter than the FCOS post-NMS top-k
        post_nms_topk_test=min(cfg.MODEL.FCOS.POST_NMS_TOPK_TEST,
                               cfg.TEST.DETECTIONS_PER_IMAGE),
        pre_nms_thresh_train=cfg.MODEL.FCOS.INFERENCE_TH_TRAIN,
        pre_nms_topk_train=cfg.MODEL.FCOS.PRE_NMS_TOPK_TRAIN,
        post_nms_topk_train=cfg.MODEL.FCOS.POST_NMS_TOPK_TRAIN,
        nms_thresh=cfg.MODEL.FCOS.NMS_TH,
        nms_candidates=cfg.TPU.NMS_CANDIDATES,
        approx_topk=cfg.TPU.APPROX_TOPK,
        mask_on=cfg.MODEL.MASK_ON,
        maskiou_on=cfg.MODEL.MASKIOU_ON,
        maskiou_loss_weight=cfg.MODEL.MASKIOU_LOSS_WEIGHT,
        keypoint_on=cfg.MODEL.KEYPOINT_ON,
        roi_in_features=tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES),
        roi_in_strides=tuple(
            {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}[f]
            for f in cfg.MODEL.ROI_HEADS.IN_FEATURES),
        assign_criterion=cfg.MODEL.ROI_MASK_HEAD.ASSIGN_CRITERION,
        pooler_resolution=cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
        pooler_sampling_ratio=cfg.TPU.POOLER_SAMPLING_RATIO,
        mask_norm=cfg.MODEL.ROI_MASK_HEAD.NORM,
        cls_agnostic_mask=cfg.MODEL.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK,
        mask_conv_dim=cfg.MODEL.ROI_MASK_HEAD.CONV_DIM,
        mask_num_conv=cfg.MODEL.ROI_MASK_HEAD.NUM_CONV,
        maskiou_conv_dim=cfg.MODEL.ROI_MASKIOU_HEAD.CONV_DIM,
        maskiou_num_conv=cfg.MODEL.ROI_MASKIOU_HEAD.NUM_CONV,
        num_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS,
        keypoint_conv_dims=tuple(cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS),
        keypoint_loss_weight=cfg.MODEL.ROI_KEYPOINT_HEAD.LOSS_WEIGHT,
        keypoint_normalize_by_visible=(
            cfg.MODEL.ROI_KEYPOINT_HEAD.NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS),
        deformable_groups=cfg.MODEL.VOVNET.DEFORMABLE_GROUPS,
        roi_iou_thresholds=tuple(cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS),
        roi_iou_labels=tuple(cfg.MODEL.ROI_HEADS.IOU_LABELS),
        proposal_append_gt=cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT,
        batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
        positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
        max_fg_proposals=cfg.TPU.MAX_FG_PROPOSALS,
        s2d_input=(cfg.TPU.S2D_STEM_INPUT and backbone_type == "vovnet"),
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        remat_backbone=cfg.TPU.REMAT_BACKBONE,
        dtype=dtype,
    )
