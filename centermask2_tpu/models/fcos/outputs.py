"""FCOS decode (inference) with static shapes.

Rebuilt from reference modeling/fcos/fcos_outputs.py:372-495:
per-level sigmoid + score threshold + top-k (the reference's
nonzero->topk export trick, here the native masked_topk), box decode
loc +- reg*stride, score sqrt(cls*ctr), cross-level class-aware NMS,
post-NMS top-k. Everything is (capacity, ...) buffers + validity masks;
batch handled by vmap.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from centermask2_tpu.ops import masked_topk, nms_select


def compute_locations_per_level(h: int, w: int, stride: int) -> jnp.ndarray:
    """Pixel-center location grid, row-major (reference fcos.py:129-144):
    (h*w, 2) of (x, y) = (col*stride, row*stride) + stride // 2."""
    shift_x = jnp.arange(0, w * stride, stride, dtype=jnp.float32)
    shift_y = jnp.arange(0, h * stride, stride, dtype=jnp.float32)
    xs = jnp.tile(shift_x[None, :], (h, 1)).reshape(-1)
    ys = jnp.tile(shift_y[:, None], (1, w)).reshape(-1)
    return jnp.stack([xs, ys], axis=1) + stride // 2


def compute_locations(
    feature_shapes: Sequence[Tuple[int, int]], strides: Sequence[int]
) -> List[jnp.ndarray]:
    return [
        compute_locations_per_level(h, w, s)
        for (h, w), s in zip(feature_shapes, strides)
    ]


class DecodedProposals(NamedTuple):
    """Fixed-capacity proposal buffers for one image (or batched with a
    leading dim). The fields mirror the reference Instances fields."""

    pred_boxes: jnp.ndarray  # (K, 4)
    scores: jnp.ndarray  # (K,)
    pred_classes: jnp.ndarray  # (K,) int32
    locations: jnp.ndarray  # (K, 2)
    valid: jnp.ndarray  # (K,) bool


def _top_k(x: jnp.ndarray, k: int, approx: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """top_k, optionally via the TPU-optimized approximate reduction.

    approx_max_k (recall ~0.95 at the tail) replaces the full-sort TopK
    custom call; the recall loss only affects candidates ranked near
    position k, the lowest-scoring tail that rarely survives NMS.

    NOTE: the shipped default is approx=False — exact top_k both matches
    reference numerics and measures FASTER than approx_max_k at the
    decode's shapes on v5e after the f32-key/barrier rewrite (6.7-7.4 vs
    8.7 ms/img e2e). If enabled (TPU.APPROX_TOPK), numerics deviate at
    the candidate tail; tests/test_ablations.py quantifies the effect
    (top-10 identical, >=90% keep-set overlap on dense scenes). On
    inputs smaller than 4k the call falls back to exact top_k regardless.
    """
    n = x.shape[-1]
    if approx and n > 4 * k:
        return jax.lax.approx_max_k(x, k, recall_target=0.95)
    if n > 4 * k and n > 16_000:
        # exact SUBLANE-PARALLEL split-merge: top-k of each chunk, then
        # top-k of the (S*k) union — the global top-k VALUES are exactly
        # the top-k of the per-chunk top-k union. S=8 places the chunk
        # axis in the vreg sublane dimension, so the per-chunk sort
        # network runs on fully-packed (8,128) f32 vregs; a single
        # [1, n] sort under the decode's vmap gets a T(1,128) layout
        # that wastes 7/8 of every vreg (profiled 0.232 ms for n=37.6k
        # k=1000 vs 0.078 chunked; 0.253 vs 0.102 at n=80k — the old
        # S=2 40k-chunk policy only filled 2 sublanes).
        # (Index tie order is NOT lax.top_k's lower-index-first — see the
        # exactness note below; tests/test_tpu_topk.py pins the real
        # guarantee on hardware.)
        S = 8
        C = -(-n // S)
        if C < k:  # each chunk must be able to hold k survivors
            S = max(1, n // k)
            C = -(-n // S)
        pad = S * C - n
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                     constant_values=-jnp.inf) if pad else x
        xs = xp.reshape(*x.shape[:-1], S, C)
        v, i = jax.lax.approx_max_k(xs, k, recall_target=1.0)  # (..., S, k)
        base = jnp.arange(S, dtype=i.dtype)[:, None] * C
        iflat = (i + base).reshape(*x.shape[:-1], S * k)
        vflat = v.reshape(*x.shape[:-1], S * k)
        vk, j = jax.lax.top_k(vflat, k)
        return vk, jnp.take_along_axis(iflat, j, axis=-1)
    if n > 4 * k:
        # exact via the TPU PartialReduce path: recall_target=1.0 returns
        # bit-identical VALUES to lax.top_k at these shapes (and
        # identical indices on distinct-valued inputs), while lowering to
        # the faster approx-top-k kernel instead of the full-sort TopK
        # custom call. Measured caveat (v5e, tests/test_tpu_topk.py):
        # among EXACTLY-equal values the index order differs from
        # lax.top_k's lower-index-first. The decode is insensitive —
        # masked (-1) fill entries fail the `> 0` validity check, and
        # reordering genuinely tied detections is AP-neutral.
        return jax.lax.approx_max_k(x, k, recall_target=1.0)
    return jax.lax.top_k(x, k)


def decode_single_image(
    locations: List[jnp.ndarray],  # per level (HW, 2)
    logits: List[jnp.ndarray],  # per level (HW, C)
    reg: List[jnp.ndarray],  # per level (HW, 4), stride-normalized
    ctrness: List[jnp.ndarray],  # per level (HW,)
    strides: Sequence[int],
    pre_nms_thresh: float,
    pre_nms_topk: int,
    nms_thresh: float,
    post_nms_topk: int,
    nms_candidates: int = 1000,
    thresh_with_ctr: bool = False,
    approx_topk: bool = False,
) -> DecodedProposals:
    """Reference forward_for_single_feature_map + select_over_all_levels
    (fcos_outputs.py:396-495), re-derived for fixed shapes."""
    masked_levels = []
    for lvl, (lg, ct) in enumerate(zip(logits, ctrness)):
        # The per-pixel (HW, C) stage stays in the head's compute dtype
        # (bf16 halves the HBM traffic of this bandwidth-bound pass);
        # everything after the top-k gather is fp32.
        cls_sig = jax.nn.sigmoid(lg)  # (HW, C)
        ctr_sig = jax.nn.sigmoid(ct).reshape(-1)  # (HW,)

        if thresh_with_ctr:
            cls_sig = cls_sig * ctr_sig[:, None]
        candidate_mask = cls_sig > pre_nms_thresh
        if not thresh_with_ctr:
            cls_sig = cls_sig * ctr_sig[:, None]
        masked_levels.append(jnp.where(
            candidate_mask, cls_sig, jnp.asarray(-1.0, cls_sig.dtype)))

    C = logits[0].shape[-1]
    if nms_candidates <= pre_nms_topk:
        # Fused cross-level selection. The final NMS working set is the
        # global top-K (K = nms_candidates) candidate (location, class)
        # pairs by score: every such pair sits inside its own level's
        # top-K (anything outranked by K pairs within one level is
        # outranked by K pairs globally), so per-level top-k followed by
        # the global cap selects the identical set — but needs 2 top-k
        # reductions instead of 12 (two per level plus the cap; each
        # costs 0.1-0.2 ms on TPU regardless of size, ~0.7 ms/img total
        # at 1344 in the round-2 profile).
        scores_cat = jnp.concatenate(masked_levels, axis=0)  # (L, C)
        # f32 for the top-k reduction: bf16 sort/approx_max_k lowers to a
        # 2-6x slower TPU path (measured 0.065 vs 0.034 ms at L=37.6k)
        loc_best = jnp.max(scores_cat, axis=1).astype(jnp.float32)  # (L,)
        # fusion boundary: without it XLA fuses the masked-score producer
        # into the top-k sort body and recomputes it per comparison
        # (profiled 0.23 ms vs 0.03 ms standalone at L=37.6k)
        scores_cat, loc_best = jax.lax.optimization_barrier(
            (scores_cat, loc_best))
        locs_cat = jnp.concatenate(locations, axis=0)
        reg_cat = jnp.concatenate(
            [r.astype(jnp.float32) * strides[lvl]
             for lvl, r in enumerate(reg)], axis=0)
        K = min(nms_candidates, scores_cat.size)
        k_loc = min(K, loc_best.shape[0])
        # a pair in the global top-K implies its location is in the
        # top-K locations by max-class score (its max dominates it)
        _, top_locs = _top_k(loc_best, k_loc, approx_topk)
        rows = jnp.take(scores_cat, top_locs, axis=0).astype(jnp.float32)
        rows = jax.lax.optimization_barrier(rows)  # same: keep the gather
        # out of the second sort's fusion body
        vals, flat_idx = _top_k(rows.reshape(-1), min(K, rows.size),
                                approx_topk)
        valid = vals > 0.0
        loc_idx = jnp.take(top_locs, flat_idx // C)
        cls_idx = flat_idx % C

        per_locs = jnp.take(locs_cat, loc_idx, axis=0)  # (K, 2)
        per_reg = jnp.take(reg_cat, loc_idx, axis=0)
        boxes = jnp.stack(
            [
                per_locs[:, 0] - per_reg[:, 0],
                per_locs[:, 1] - per_reg[:, 1],
                per_locs[:, 0] + per_reg[:, 2],
                per_locs[:, 1] + per_reg[:, 3],
            ],
            axis=1,
        )
        scores = jnp.where(valid, jnp.sqrt(jnp.maximum(vals, 0.0)), 0.0)
        classes = cls_idx.astype(jnp.int32)
        keep_idx, keep_valid = nms_select(boxes, scores, classes, valid,
                                          nms_thresh, post_nms_topk)
        return DecodedProposals(
            pred_boxes=jnp.take(boxes, keep_idx, axis=0),
            scores=jnp.where(keep_valid, jnp.take(scores, keep_idx), 0.0),
            pred_classes=jnp.take(classes, keep_idx),
            locations=jnp.take(per_locs, keep_idx, axis=0),
            valid=keep_valid,
        )

    # Per-level path (reference-literal): needed when nms_candidates >
    # pre_nms_topk, where the per-level caps bind individually.
    cand_boxes, cand_scores, cand_cls, cand_locs, cand_valid = [], [], [], [], []
    for lvl, (locs, masked_scores, rg) in enumerate(
            zip(locations, masked_levels, reg)):
        k = min(pre_nms_topk, masked_scores.size)
        # Exact top-k over (HW*C) in two stages: first rank locations by
        # their best masked class score (a location contributing any
        # global-top-k pair must be in the top-k locations by max — its
        # max dominates that pair), then re-rank the survivors' full
        # class rows. Cuts the big sort from HW*C to HW elements
        # (80x for COCO), the decode hot spot on TPU.
        k_loc = min(k, masked_scores.shape[0])
        loc_best = jnp.max(masked_scores, axis=1)  # (HW,)
        _, top_locs = _top_k(loc_best, k_loc, approx_topk)  # (k_loc,)
        rows = jnp.take(masked_scores, top_locs, axis=0).astype(jnp.float32)
        vals, flat_idx = _top_k(rows.reshape(-1), k, approx_topk)
        valid = vals > 0.0
        loc_idx = jnp.take(top_locs, flat_idx // C)
        cls_idx = flat_idx % C

        per_locs = jnp.take(locs, loc_idx, axis=0)  # (k, 2)
        per_reg = jnp.take(rg.astype(jnp.float32), loc_idx, axis=0) * strides[lvl]
        boxes = jnp.stack(
            [
                per_locs[:, 0] - per_reg[:, 0],
                per_locs[:, 1] - per_reg[:, 1],
                per_locs[:, 0] + per_reg[:, 2],
                per_locs[:, 1] + per_reg[:, 3],
            ],
            axis=1,
        )
        scores = jnp.sqrt(jnp.maximum(vals, 0.0))  # sqrt(cls*ctr), fcos_outputs.py:460

        cand_boxes.append(boxes)
        cand_scores.append(jnp.where(valid, scores, 0.0))
        cand_cls.append(cls_idx.astype(jnp.int32))
        cand_locs.append(per_locs)
        cand_valid.append(valid)

    boxes = jnp.concatenate(cand_boxes, 0)
    scores = jnp.concatenate(cand_scores, 0)
    classes = jnp.concatenate(cand_cls, 0)
    locs = jnp.concatenate(cand_locs, 0)
    valid = jnp.concatenate(cand_valid, 0)

    # Cap the NMS working set (score-ranked); the exact-greedy NMS cost is
    # quadratic in this capacity.
    if boxes.shape[0] > nms_candidates:
        idx, valid, _ = masked_topk(scores, valid, nms_candidates)
        boxes = jnp.take(boxes, idx, axis=0)
        scores = jnp.take(scores, idx, axis=0)
        classes = jnp.take(classes, idx, axis=0)
        locs = jnp.take(locs, idx, axis=0)

    keep_idx, keep_valid = nms_select(boxes, scores, classes, valid,
                                      nms_thresh, post_nms_topk)
    return DecodedProposals(
        pred_boxes=jnp.take(boxes, keep_idx, axis=0),
        scores=jnp.where(keep_valid, jnp.take(scores, keep_idx), 0.0),
        pred_classes=jnp.take(classes, keep_idx),
        locations=jnp.take(locs, keep_idx, axis=0),
        valid=keep_valid,
    )


def decode_batch(
    locations: List[jnp.ndarray],
    logits: List[jnp.ndarray],  # per level (B, Hl, Wl, C)
    reg: List[jnp.ndarray],
    ctrness: List[jnp.ndarray],
    strides: Sequence[int],
    **kwargs,
) -> DecodedProposals:
    """vmap decode over the batch; NHWC head outputs are flattened to
    (B, HW, C) row-major, matching the location grids."""
    B = logits[0].shape[0]
    flat_logits = [x.reshape(B, -1, x.shape[-1]) for x in logits]
    flat_reg = [x.reshape(B, -1, 4) for x in reg]
    flat_ctr = [x.reshape(B, -1) for x in ctrness]

    def one(lg, rg, ct):
        return decode_single_image(locations, list(lg), list(rg), list(ct),
                                   strides, **kwargs)

    if B == 1:
        # Bypass vmap for the serving batch size: a vmapped unit batch
        # dim gives every sort/top-k a [1, n] operand with a T(1,128)
        # tiled layout (7/8 of each vreg wasted); the squeezed call gets
        # the natural 1-D T(1024) layout (profiled 0.038 vs 0.232 ms for
        # the 37.6k-candidate top-k). Semantics identical to vmap.
        out = one([x[0] for x in flat_logits], [x[0] for x in flat_reg],
                  [x[0] for x in flat_ctr])
        return jax.tree.map(lambda a: a[None], out)
    return jax.vmap(one)(flat_logits, flat_reg, flat_ctr)
