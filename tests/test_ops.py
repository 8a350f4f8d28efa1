import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from centermask2_tpu.ops import (
    batched_nms,
    iou_loss,
    masked_topk,
    multilevel_roi_align,
    nms_keep_mask,
    nms_select,
    nonzero_padded,
    paste_masks,
    roi_align,
    sigmoid_focal_loss,
    assign_boxes_by_ratio,
)


# ---------------------------------------------------------------- selection
def test_masked_topk():
    scores = jnp.array([0.1, 0.9, 0.5, 0.7])
    mask = jnp.array([True, False, True, True])
    idx, valid, vals = masked_topk(scores, mask, 3)
    assert list(np.asarray(idx)[:2]) == [3, 2]
    assert list(np.asarray(valid)) == [True, True, True]
    idx, valid, _ = masked_topk(scores, jnp.array([False, False, True, False]), 3)
    assert list(np.asarray(valid)) == [True, False, False]
    assert int(idx[0]) == 2


def test_nonzero_padded():
    mask = jnp.array([False, True, False, True, True, False])
    idx, valid = nonzero_padded(mask, 4)
    assert list(np.asarray(idx)[:3]) == [1, 3, 4]
    assert list(np.asarray(valid)) == [True, True, True, False]


# ---------------------------------------------------------------- NMS
def np_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i or scores[j] > scores[i]:
                continue
            # iou
            ix0 = max(boxes[i, 0], boxes[j, 0]); iy0 = max(boxes[i, 1], boxes[j, 1])
            ix1 = min(boxes[i, 2], boxes[j, 2]); iy1 = min(boxes[i, 3], boxes[j, 3])
            inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (a + b - inter) if a + b - inter > 0 else 0
            if iou > thr:
                suppressed[j] = True
    return sorted(keep)


def test_nms_matches_numpy_greedy():
    rng = np.random.RandomState(0)
    n = 64
    boxes = rng.rand(n, 4).astype(np.float32) * 50
    boxes[:, 2:] = boxes[:, :2] + 5 + boxes[:, 2:] * 0.5
    scores = rng.rand(n).astype(np.float32)
    ref = np_greedy_nms(boxes, scores, 0.5)
    keep = nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.ones(n, bool), 0.5)
    got = sorted(np.nonzero(np.asarray(keep))[0].tolist())
    assert got == ref


def test_nms_respects_validity():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    # highest-score box invalid: must not suppress the second
    keep = nms_keep_mask(boxes, scores, jnp.array([False, True, True]), 0.5)
    assert list(np.asarray(keep)) == [False, True, True]


def test_batched_nms_classwise():
    # identical boxes, different classes: both kept
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    keep = batched_nms(boxes, scores, jnp.array([0, 1]), jnp.ones(2, bool), 0.5)
    assert list(np.asarray(keep)) == [True, True]
    keep = batched_nms(boxes, scores, jnp.array([1, 1]), jnp.ones(2, bool), 0.5)
    assert list(np.asarray(keep)) == [True, False]


def test_nms_select_ordering():
    rng = np.random.RandomState(1)
    n = 40
    boxes = rng.rand(n, 4).astype(np.float32) * 100
    boxes[:, 2:] = boxes[:, :2] + 3 + boxes[:, 2:] * 0.3
    scores = rng.rand(n).astype(np.float32)
    classes = rng.randint(0, 3, n)
    idx, valid = nms_select(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.asarray(classes), jnp.ones(n, bool), 0.5, 10)
    idx, valid = np.asarray(idx), np.asarray(valid)
    kept_scores = scores[idx[valid]]
    assert np.all(np.diff(kept_scores) <= 0)  # descending


# ---------------------------------------------------------------- losses
def test_sigmoid_focal_loss_matches_torch_composition():
    rng = np.random.RandomState(2)
    logits = rng.randn(30, 80).astype(np.float32)
    targets = (rng.rand(30, 80) > 0.9).astype(np.float32)
    lt, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    p = torch.sigmoid(lt)
    ce = TF.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p_t = p * tt + (1 - p) * (1 - tt)
    ref = (0.25 * tt + 0.75 * (1 - tt)) * ce * (1 - p_t) ** 2
    got = sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                             alpha=0.25, gamma=2.0)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_iou_loss_matches_reference_math():
    rng = np.random.RandomState(3)
    pred = np.abs(rng.randn(20, 4)).astype(np.float32) * 10
    tgt = np.abs(rng.randn(20, 4)).astype(np.float32) * 10
    w = rng.rand(20).astype(np.float32)

    # oracle: reference layers/iou_loss.py math in numpy
    pl, pt, pr, pb = pred.T
    tl, tt_, tr, tb = tgt.T
    t_area = (tl + tr) * (tt_ + tb)
    p_area = (pl + pr) * (pt + pb)
    w_i = np.minimum(pl, tl) + np.minimum(pr, tr)
    h_i = np.minimum(pb, tb) + np.minimum(pt, tt_)
    g_w = np.maximum(pl, tl) + np.maximum(pr, tr)
    g_h = np.maximum(pb, tb) + np.maximum(pt, tt_)
    ac = g_w * g_h
    inter = w_i * h_i
    union = t_area + p_area - inter
    ious = (inter + 1.0) / (union + 1.0)
    gious = ious - (ac - union) / ac
    ref = ((1 - gious) * w).sum()

    got = iou_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(w), "giou")
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


# ---------------------------------------------------------------- ROIAlign
def np_roi_align(feat_hwc, boxes, scale, out_size, sampling_ratio, aligned=True):
    """Independent naive implementation of ROIAlignV2 (per CUDA spec)."""
    H, W, C = feat_hwc.shape
    R = len(boxes)
    out = np.zeros((R, out_size, out_size, C), np.float32)
    off = 0.5 if aligned else 0.0
    for r, box in enumerate(boxes):
        x0, y0, x1, y1 = box * scale - off
        rw, rh = x1 - x0, y1 - y0
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out_size, rh / out_size
        s = sampling_ratio
        for ph in range(out_size):
            for pw in range(out_size):
                acc = np.zeros(C, np.float32)
                for iy in range(s):
                    for ix in range(s):
                        y = y0 + ph * bh + (iy + 0.5) * bh / s
                        x = x0 + pw * bw + (ix + 0.5) * bw / s
                        if y < -1.0 or y > H or x < -1.0 or x > W:
                            continue
                        y, x = max(y, 0.0), max(x, 0.0)
                        yl, xl = int(np.floor(y)), int(np.floor(x))
                        if yl >= H - 1:
                            yl = yh = H - 1
                            y = float(yl)
                        else:
                            yh = yl + 1
                        if xl >= W - 1:
                            xl = xh = W - 1
                            x = float(xl)
                        else:
                            xh = xl + 1
                        ly, lx = y - yl, x - xl
                        acc += (
                            feat_hwc[yl, xl] * (1 - ly) * (1 - lx)
                            + feat_hwc[yl, xh] * (1 - ly) * lx
                            + feat_hwc[yh, xl] * ly * (1 - lx)
                            + feat_hwc[yh, xh] * ly * lx
                        )
                out[r, ph, pw] = acc / (s * s)
    return out


def test_roi_align_matches_naive():
    rng = np.random.RandomState(4)
    feat = rng.randn(24, 32, 5).astype(np.float32)
    boxes = np.array(
        [[8, 8, 60, 40], [0, 0, 128, 96], [30.5, 10.2, 95.7, 80.1],
         [120, 90, 127, 95], [-4, -4, 10, 10]], np.float32)
    ref = np_roi_align(feat, boxes, 0.25, 7, 2, aligned=True)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 0.25, 7, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_roi_align_unaligned_matches_naive():
    rng = np.random.RandomState(5)
    feat = rng.randn(16, 16, 3).astype(np.float32)
    boxes = np.array([[4, 4, 40, 40], [10, 20, 50, 61]], np.float32)
    ref = np_roi_align(feat, boxes, 0.25, 7, 2, aligned=False)
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(boxes), 0.25, 7, 2, aligned=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_multilevel_roi_align_matches_single_level():
    rng = np.random.RandomState(6)
    C = 4
    f0 = rng.randn(2, 32, 32, C).astype(np.float32)  # stride 8
    f1 = rng.randn(2, 16, 16, C).astype(np.float32)  # stride 16
    f2 = rng.randn(2, 8, 8, C).astype(np.float32)  # stride 32
    boxes = np.array(
        [[10, 10, 60, 60], [5, 5, 200, 200], [40, 80, 140, 180]], np.float32)
    batch_idx = np.array([0, 1, 0])
    levels = np.array([0, 2, 1])
    scales = [1 / 8, 1 / 16, 1 / 32]
    got = np.asarray(multilevel_roi_align(
        [jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(f2)],
        jnp.asarray(boxes), jnp.asarray(batch_idx), jnp.asarray(levels),
        scales, 7, 2))
    feats = [f0, f1, f2]
    for r in range(3):
        ref = np_roi_align(feats[levels[r]][batch_idx[r]], boxes[r : r + 1],
                           scales[levels[r]], 7, 2)
        np.testing.assert_allclose(got[r], ref[0], rtol=1e-4, atol=1e-5)


def test_multilevel_roi_align_separable_grad_matches_autodiff():
    """The custom separable-matmul VJP (two dot_generals per level) must
    produce the same feature cotangent as XLA autodiff of the raw gather
    (the scatter-add path, separable_grad=False). Boxes straddle borders,
    degenerate to near-zero size, and hang off the canvas to exercise the
    clamp/in-range semantics the axis matrices must reproduce."""
    rng = np.random.RandomState(11)
    C = 6
    feats = [jnp.asarray(rng.randn(2, 16, 24, C).astype(np.float32)),
             jnp.asarray(rng.randn(2, 8, 12, C).astype(np.float32))]
    boxes = jnp.asarray(np.array(
        [[10, 10, 60, 60],       # interior
         [-20, -20, 30, 40],     # off-canvas top-left
         [100, 60, 250, 140],    # off-canvas bottom-right
         [5, 5, 5.4, 5.3],       # degenerate
         [0, 0, 192, 128]],      # full canvas
        np.float32))
    bidx = jnp.asarray(np.array([0, 1, 0, 1, 0], np.int32))
    levels = jnp.asarray(np.array([0, 0, 1, 0, 1], np.int32))
    scales = [1 / 8, 1 / 16]
    cot = rng.randn(5, 7, 7, C).astype(np.float32)

    def loss(fs, sep):
        out = multilevel_roi_align(fs, boxes, bidx, levels, scales, 7, 2,
                                   separable_grad=sep)
        return jnp.sum(out * jnp.asarray(cot))

    g_sep = jax.grad(lambda fs: loss(fs, True))(feats)
    g_ad = jax.grad(lambda fs: loss(fs, False))(feats)
    for gs, ga in zip(g_sep, g_ad):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(ga),
                                   rtol=1e-4, atol=1e-5)
    # box cotangent is zero by contract (torchvision roi_align backward
    # likewise only produces grad_input; proposals are detached upstream)
    g_box = jax.grad(
        lambda b: jnp.sum(multilevel_roi_align(feats, b, bidx, levels,
                                               scales, 7, 2)))(boxes)
    np.testing.assert_array_equal(np.asarray(g_box), 0.0)


def test_adaptive_sampling_ratio_grad_matches_autodiff():
    """sampling_ratio=0 composes three custom-VJP pools through jnp.where;
    the feature gradient must still match plain autodiff."""
    rng = np.random.RandomState(12)
    feat = [jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))]
    boxes = jnp.asarray(np.array([[8, 8, 32, 30], [2, 3, 102, 98]], np.float32))
    zi = jnp.zeros(2, jnp.int32)
    cot = jnp.asarray(rng.randn(2, 7, 7, 3).astype(np.float32))

    def loss(fs, sep):
        out = multilevel_roi_align(fs, boxes, zi, zi, [0.25], 7, 0,
                                   separable_grad=sep)
        return jnp.sum(out * cot)

    g_sep = jax.grad(lambda fs: loss(fs, True))(feat)
    g_ad = jax.grad(lambda fs: loss(fs, False))(feat)
    np.testing.assert_allclose(np.asarray(g_sep[0]), np.asarray(g_ad[0]),
                               rtol=1e-4, atol=1e-5)


def test_adaptive_sampling_ratio_matches_d2_semantics():
    """sampling_ratio=0 (detectron2 adaptive: grid = ceil(roi/out)) via
    static buckets {1,2,4}: exact for ROIs whose ceil is a bucket value
    (the common case under FPN level assignment); ceil=3 clamps to the
    4-sample pool (documented divergence)."""
    rng = np.random.RandomState(7)
    C = 3
    feat = rng.randn(1, 32, 32, C).astype(np.float32)
    # feat-coord spans/7 -> ceil: 1, 2, 4 (exact) and 3 (clamped to 4)
    boxes = np.array([[8, 8, 32, 30],      # ~6.0 x 5.5   -> 1
                      [0, 0, 52, 50],      # 13 x 12.5    -> 2
                      [2, 3, 102, 98],     # 25 x 23.75   -> 4
                      [4, 4, 90, 88]],     # 21.5 x 21    -> 3 (clamps to 4)
                     np.float32)
    got = np.asarray(multilevel_roi_align(
        [jnp.asarray(feat)], jnp.asarray(boxes),
        jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
        [0.25], 7, sampling_ratio=0))
    for r, s_true in enumerate((1, 2, 4)):
        ref = np_roi_align(feat[0], boxes[r:r + 1], 0.25, 7, s_true)
        np.testing.assert_allclose(got[r], ref[0], rtol=1e-4, atol=1e-5,
                                   err_msg=f"roi {r} s={s_true}")
    # the ceil=3 ROI uses the 4-sample bucket
    ref4 = np_roi_align(feat[0], boxes[3:4], 0.25, 7, 4)
    np.testing.assert_allclose(got[3], ref4[0], rtol=1e-4, atol=1e-5)


def test_assign_boxes_by_ratio():
    # box area == img area -> log2(1)=0 -> ceil(max_level) = max_level
    img_areas = jnp.array([1000.0, 1000.0, 1000.0])
    box_areas = jnp.array([1000.0, 250.0, 15.0])
    lv = assign_boxes_by_ratio(box_areas, img_areas, 3, 5)
    # ratios 1, 4, ~66 -> levels 5, 3, 3 (clamped) -> offsets [2, 0, 0]
    assert list(np.asarray(lv)) == [2, 0, 0]


# ---------------------------------------------------------------- paste_masks
def test_paste_masks_matches_torch_grid_sample():
    rng = np.random.RandomState(7)
    M = 28
    masks = rng.rand(3, M, M).astype(np.float32)
    boxes = np.array(
        [[10.3, 15.7, 80.9, 90.2], [0, 0, 40, 40], [50, 60, 118, 118]], np.float32)
    H = W = 120

    got = np.asarray(paste_masks(jnp.asarray(masks), jnp.asarray(boxes),
                                 (H, W), threshold=-1.0))

    # oracle: torch grid_sample per ROI over the box's integer footprint
    for r in range(3):
        x0, y0, x1, y1 = boxes[r]
        xi0, yi0 = int(np.floor(x0)), int(np.floor(y0))
        xi1, yi1 = int(np.ceil(x1)), int(np.ceil(y1))
        ys = (torch.arange(yi0, yi1, dtype=torch.float32) + 0.5 - y0) / (y1 - y0) * 2 - 1
        xs = (torch.arange(xi0, xi1, dtype=torch.float32) + 0.5 - x0) / (x1 - x0) * 2 - 1
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        grid = torch.stack([gx, gy], dim=-1)[None]
        ref = TF.grid_sample(torch.from_numpy(masks[r])[None, None], grid,
                             align_corners=False).numpy()[0, 0]
        np.testing.assert_allclose(got[r, yi0:yi1, xi0:xi1], ref, rtol=1e-4, atol=1e-5)
        # outside footprint must be exactly zero
        outside = got[r].copy()
        outside[yi0:yi1, xi0:xi1] = 0
        assert np.abs(outside).max() == 0.0


def test_paste_masks_threshold():
    masks = jnp.ones((1, 28, 28)) * 0.9
    out = paste_masks(masks, jnp.array([[2.0, 2.0, 10.0, 10.0]]), (16, 16), 0.5)
    arr = np.asarray(out[0])
    assert arr.dtype == bool
    assert arr[5, 5] and not arr[0, 0] and not arr[14, 14]


def test_tiled_nms_matches_greedy_across_tiles():
    """Stress the tiled fixpoint NMS across tile boundaries and deep
    suppression chains (oracle: sequential greedy)."""
    rng = np.random.RandomState(42)
    n = 300  # crosses three tiles of 128
    # dense cluster -> long suppression chains
    centers = rng.rand(n, 2) * 30
    sizes = 5 + rng.rand(n, 2) * 10
    boxes = np.concatenate([centers, centers + sizes], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) > 0.1
    ref_keep = np.zeros(n, bool)
    kept = np_greedy_nms(boxes[valid], scores[valid], 0.5)
    ref_keep[np.nonzero(valid)[0][kept]] = True
    got = np.asarray(nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                   jnp.asarray(valid), 0.5))
    np.testing.assert_array_equal(got, ref_keep)


def test_tiled_nms_small_tile():
    rng = np.random.RandomState(7)
    n = 50
    boxes = rng.rand(n, 4).astype(np.float32) * 40
    boxes[:, 2:] = boxes[:, :2] + 4 + boxes[:, 2:] * 0.4
    scores = rng.rand(n).astype(np.float32)
    ref = np_greedy_nms(boxes, scores, 0.4)
    got = nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.ones(n, bool), 0.4, tile=16)
    assert sorted(np.nonzero(np.asarray(got))[0].tolist()) == ref


def _pallas_keep(boxes, scores, valid, thr, tile=128):
    """Sort/pad exactly as nms_keep_mask does, run the Pallas greedy core
    (interpret mode on CPU), scatter back to input order."""
    from centermask2_tpu.ops.nms_pallas import greedy_keep_sorted

    boxes, scores = jnp.asarray(boxes), jnp.asarray(scores)
    valid = jnp.asarray(valid)
    n = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    sboxes = jnp.take(boxes, order, axis=0)
    svalid = jnp.take(valid, order)
    if n % tile != 0:
        pad = tile - n % tile
        sboxes = jnp.concatenate([sboxes, jnp.zeros((pad, 4), sboxes.dtype)])
        svalid = jnp.concatenate([svalid, jnp.zeros((pad,), bool)])
    keep_sorted = greedy_keep_sorted(sboxes, svalid, float(thr), tile=tile,
                                     interpret=True)
    return np.asarray(jnp.zeros((n,), bool).at[order].set(keep_sorted[:n]))


def test_pallas_nms_matches_xla_and_greedy():
    """The fused Pallas NMS core (interpret mode) must produce the exact
    keep set of both the XLA tiled fixpoint and the sequential greedy
    oracle — dense clusters crossing several 128-tiles, with invalids."""
    rng = np.random.RandomState(42)
    n = 300
    centers = rng.rand(n, 2) * 30
    sizes = 5 + rng.rand(n, 2) * 10
    boxes = np.concatenate([centers, centers + sizes], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) > 0.1
    ref_keep = np.zeros(n, bool)
    kept = np_greedy_nms(boxes[valid], scores[valid], 0.5)
    ref_keep[np.nonzero(valid)[0][kept]] = True
    got = _pallas_keep(boxes, scores, valid, 0.5)
    np.testing.assert_array_equal(got, ref_keep)
    xla = np.asarray(nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                   jnp.asarray(valid), 0.5))
    np.testing.assert_array_equal(got, xla)


def test_pallas_nms_small_tile_and_sparse():
    rng = np.random.RandomState(7)
    n = 50
    boxes = rng.rand(n, 4).astype(np.float32) * 40
    boxes[:, 2:] = boxes[:, :2] + 4 + boxes[:, 2:] * 0.4
    scores = rng.rand(n).astype(np.float32)
    ref = np_greedy_nms(boxes, scores, 0.4)
    got = _pallas_keep(boxes, scores, np.ones(n, bool), 0.4, tile=16)
    assert sorted(np.nonzero(got)[0].tolist()) == ref


def test_pallas_nms_vmap_batches():
    """decode_batch vmaps NMS for B>1: the pallas_call must batch
    correctly (one grid slot per image)."""
    from centermask2_tpu.ops.nms_pallas import greedy_keep_sorted

    rng = np.random.RandomState(3)
    B, n = 3, 128
    boxes = rng.rand(B, n, 4).astype(np.float32) * 40
    boxes[..., 2:] = boxes[..., :2] + 4 + boxes[..., 2:] * 0.4
    scores = -np.sort(-rng.rand(B, n).astype(np.float32), axis=1)  # sorted
    valid = np.ones((B, n), bool)
    got = jax.vmap(lambda b, v: greedy_keep_sorted(b, v, 0.5, interpret=True)
                   )(jnp.asarray(boxes), jnp.asarray(valid))
    for k in range(B):
        ref = np.zeros(n, bool)
        ref[np_greedy_nms(boxes[k], scores[k], 0.5)] = True
        np.testing.assert_array_equal(np.asarray(got[k]), ref)


def test_pallas_nms_is_differentiable_through():
    """The train step differentiates THROUGH proposal selection: the keep
    mask gates box/score tensors that carry gradients. pallas_call has no
    autodiff rule, so greedy_keep_sorted severs tangents on its inputs
    (stop_gradient) — grads must flow through the gated values exactly as
    in the XLA path (where NMS's comparison grads are identically zero)."""
    from centermask2_tpu.ops.nms_pallas import greedy_keep_sorted

    rng = np.random.RandomState(11)
    n = 128
    boxes = rng.rand(n, 4).astype(np.float32) * 40
    boxes[:, 2:] = boxes[:, :2] + 4 + boxes[:, 2:] * 0.4

    def loss(b):
        keep = greedy_keep_sorted(b, jnp.ones((n,), bool), 0.5,
                                  interpret=True)
        return jnp.sum(jnp.where(keep[:, None], b, 0.0))

    g = jax.grad(loss)(jnp.asarray(boxes))
    keep = np.asarray(greedy_keep_sorted(
        jnp.asarray(boxes), jnp.ones((n,), bool), 0.5, interpret=True))
    expected = np.broadcast_to(
        np.where(keep[:, None], 1.0, 0.0), (n, 4)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(g), expected)


def test_pallas_roi_align_matches_xla(monkeypatch):
    """Pallas kernel (interpret mode on CPU) vs the XLA reference impl."""
    from centermask2_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

    rng = np.random.RandomState(8)
    C = 128  # multiple of the 128-lane tile so the kernel path (not the
    # XLA fallback) is exercised
    f0 = rng.randn(1, 16, 16, C).astype(np.float32)
    f1 = rng.randn(1, 8, 8, C).astype(np.float32)
    boxes = np.array([[8, 8, 60, 60], [4, 4, 100, 100]], np.float32)
    batch_idx = np.array([0, 0])
    levels = np.array([0, 1])
    scales = [1 / 8, 1 / 16]
    ref = np.asarray(multilevel_roi_align(
        [jnp.asarray(f0), jnp.asarray(f1)], jnp.asarray(boxes),
        jnp.asarray(batch_idx), jnp.asarray(levels), scales, 7, 2))
    got = np.asarray(multilevel_roi_align_pallas(
        [jnp.asarray(f0), jnp.asarray(f1)], jnp.asarray(boxes),
        jnp.asarray(batch_idx), jnp.asarray(levels), scales, 7, 2,
        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_crop_and_resize_patches_matches_roi_align_oracle():
    """The separable-matmul GT-patch resampler (meta.py, the train-step
    hot-path fix: a vmapped per-patch roi_align lowers to a scalar
    gather, 32.6 ms/step on v5e) must match per-patch roi_align to fp
    tolerance across overlapping / contained / disjoint / degenerate
    boxes."""
    from centermask2_tpu.models.meta import crop_and_resize_patches

    rng = np.random.RandomState(17)
    R, P = 48, 28
    patches = jnp.asarray(rng.rand(R, P, P).astype(np.float32))
    gt = np.zeros((R, 4), np.float32)
    gt[:, :2] = rng.uniform(0, 100, (R, 2))
    gt[:, 2:] = gt[:, :2] + rng.uniform(5, 80, (R, 2))
    prop = np.zeros((R, 4), np.float32)
    prop[:, :2] = gt[:, :2] + rng.uniform(-30, 30, (R, 2))
    prop[:, 2:] = prop[:, :2] + rng.uniform(1, 120, (R, 2))
    gt[0, 2] = gt[0, 0]  # degenerate gt box
    prop[1] = gt[1]      # proposal == gt (identity resample)
    prop[2, :2] = gt[2, 2:] + 50  # fully outside
    prop[2, 2:] = prop[2, :2] + 10

    def oracle(patches_, gt_, prop_, out):
        gx0, gy0, gx1, gy1 = [gt_[:, i] for i in range(4)]
        sx = P / jnp.maximum(gx1 - gx0, 1e-6)
        sy = P / jnp.maximum(gy1 - gy0, 1e-6)
        boxes_p = jnp.stack([(prop_[:, 0] - gx0) * sx,
                             (prop_[:, 1] - gy0) * sy,
                             (prop_[:, 2] - gx0) * sx,
                             (prop_[:, 3] - gy0) * sy], axis=1)

        def one(patch, box):
            return roi_align(patch[:, :, None], box[None], 1.0, out,
                             sampling_ratio=2, aligned=True)[0, :, :, 0]

        return jax.vmap(one)(patches_, boxes_p)

    gt_j, prop_j = jnp.asarray(gt), jnp.asarray(prop)
    for out in (28, 14):
        want = np.asarray(oracle(patches, gt_j, prop_j, out))
        got = np.asarray(crop_and_resize_patches(patches, gt_j, prop_j, out))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        assert np.isfinite(got).all()
