import numpy as np
import pytest

from centermask2_tpu.evaluation import COCOEval, COCOEvaluator, COCOGt, rle


# ------------------------------------------------------------------ RLE
def np_rle_encode(mask):
    flat = np.asfortranarray(mask.astype(np.uint8)).reshape(-1, order="F")
    counts = []
    prev, run = 0, 0
    for v in flat:
        if v != prev:
            counts.append(run)
            run = 0
            prev = v
        run += 1
    counts.append(run)
    return counts


def test_rle_roundtrip_and_area():
    rng = np.random.RandomState(0)
    mask = rng.rand(37, 53) > 0.6
    r = rle.encode(mask)
    assert r.counts.tolist() == np_rle_encode(mask)
    back = rle.decode(r)
    np.testing.assert_array_equal(back, mask)
    assert rle.area(r) == int(mask.sum())


def test_rle_string_roundtrip():
    rng = np.random.RandomState(1)
    mask = rng.rand(64, 48) > 0.5
    r = rle.encode(mask)
    s = rle.to_string(r)
    r2 = rle.from_string(s, r.h, r.w)
    np.testing.assert_array_equal(r2.counts, r.counts)
    # known pycocotools vector: a simple 3x3 mask
    m = np.zeros((3, 3), bool)
    m[1, 1] = True
    rr = rle.encode(m)
    assert rr.counts.tolist() == [4, 1, 4]
    assert rle.decode(rle.from_string(rle.to_string(rr), 3, 3)).sum() == 1


def test_rle_iou_matches_mask_iou():
    rng = np.random.RandomState(2)
    masks_a = [rng.rand(40, 40) > 0.5 for _ in range(3)]
    masks_b = [rng.rand(40, 40) > 0.5 for _ in range(2)]
    got = rle.iou([rle.encode(m) for m in masks_a],
                  [rle.encode(m) for m in masks_b])
    for i, a in enumerate(masks_a):
        for j, b in enumerate(masks_b):
            inter = (a & b).sum()
            union = (a | b).sum()
            np.testing.assert_allclose(got[i, j], inter / union, rtol=1e-9)


def test_rle_iou_crowd_semantics():
    a = np.zeros((10, 10), bool); a[:5, :5] = True  # dt, area 25
    b = np.zeros((10, 10), bool); b[:10, :5] = True  # gt crowd, area 50
    got = rle.iou([rle.encode(a)], [rle.encode(b)], iscrowd=[1])
    np.testing.assert_allclose(got[0, 0], 25 / 25)  # union = dt area
    got = rle.iou([rle.encode(a)], [rle.encode(b)], iscrowd=[0])
    np.testing.assert_allclose(got[0, 0], 25 / 50)


def test_bbox_iou():
    dt = np.array([[0, 0, 10, 10]])  # xywh
    gt = np.array([[5, 0, 10, 10], [0, 0, 10, 10]])
    got = rle.bbox_iou(dt, gt)
    np.testing.assert_allclose(got[0, 0], 50 / 150)
    np.testing.assert_allclose(got[0, 1], 1.0)


def test_rle_merge():
    a = np.zeros((8, 8), bool); a[:4] = True
    b = np.zeros((8, 8), bool); b[2:6] = True
    u = rle.decode(rle.merge([rle.encode(a), rle.encode(b)]))
    np.testing.assert_array_equal(u, a | b)
    i = rle.decode(rle.merge([rle.encode(a), rle.encode(b)], intersect=True))
    np.testing.assert_array_equal(i, a & b)


# ------------------------------------------------------------------ COCOEval
def make_gt():
    return COCOGt({
        "images": [{"id": 1, "height": 100, "width": 100},
                   {"id": 2, "height": 100, "width": 100}],
        "categories": [{"id": 7, "name": "a"}, {"id": 9, "name": "b"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7, "iscrowd": 0,
             "bbox": [10, 10, 30, 30], "area": 900,
             "segmentation": [[10, 10, 40, 10, 40, 40, 10, 40]]},
            {"id": 2, "image_id": 1, "category_id": 9, "iscrowd": 0,
             "bbox": [50, 50, 20, 40], "area": 800,
             "segmentation": [[50, 50, 70, 50, 70, 90, 50, 90]]},
            {"id": 3, "image_id": 2, "category_id": 7, "iscrowd": 0,
             "bbox": [0, 0, 50, 50], "area": 2500,
             "segmentation": [[0, 0, 50, 0, 50, 50, 0, 50]]},
        ],
    })


def test_native_match_equals_python_oracle():
    """maskapi.cpp:coco_match must reproduce the pure-Python evaluateImg
    loop exactly — random scenes with crowds, ignored areas, duplicate
    detections, and IoU ties."""
    from centermask2_tpu.evaluation.coco_eval import AREA_RNG, _match_image

    rng = np.random.RandomState(7)
    next_id = [1]

    def make(n, crowd_frac=0.0):
        items = []
        for _ in range(n):
            w, h = rng.uniform(4, 60, 2)
            x, y = rng.uniform(0, 80, 2)
            items.append({
                "id": next_id[0],
                "bbox": [x, y, w, h],
                "area": float(w * h),
                "score": float(np.round(rng.rand(), 2)),  # force ties
                "iscrowd": int(rng.rand() < crowd_frac),
            })
            next_id[0] += 1
        return items

    for trial in range(20):
        dts = make(rng.randint(0, 12))
        gts = make(rng.randint(0, 9), crowd_frac=0.3)
        crowd = [g["iscrowd"] for g in gts]
        d = np.array([x["bbox"] for x in dts], np.float64).reshape(-1, 4)
        g = np.array([x["bbox"] for x in gts], np.float64).reshape(-1, 4)
        ious = (rle.bbox_iou(d, g, crowd) if len(dts) and len(gts)
                else np.zeros((len(dts), len(gts))))
        for rng_name, area_rng in AREA_RNG.items():
            for max_det in (1, 10, 100):
                a = _match_image(dts, gts, ious, area_rng, max_det,
                                 use_native=True)
                b = _match_image(dts, gts, ious, area_rng, max_det,
                                 use_native=False)
                for key in ("dt_scores", "dt_matches", "dt_ignore"):
                    np.testing.assert_array_equal(
                        a[key], b[key],
                        err_msg=f"trial={trial} {rng_name} md={max_det} {key}")
                assert a["num_gt"] == b["num_gt"]


def test_perfect_predictions_ap100():
    gt = make_gt()
    dets = []
    for img_id, anns in gt.img_to_anns.items():
        for ann in anns:
            dets.append({"image_id": img_id, "category_id": ann["category_id"],
                         "bbox": list(ann["bbox"]), "score": 0.9})
    res = COCOEval(gt, "bbox").evaluate(dets)
    assert res["AP"] == pytest.approx(100.0)
    assert res["AP50"] == pytest.approx(100.0)
    assert res["AR100"] == pytest.approx(100.0)


def test_missed_detection_lowers_ap():
    gt = make_gt()
    dets = [{"image_id": 1, "category_id": 7, "bbox": [10, 10, 30, 30],
             "score": 0.9},
            {"image_id": 1, "category_id": 9, "bbox": [50, 50, 20, 40],
             "score": 0.9}]
    # cat 7 misses image 2's gt entirely: per-cat AP = (100 * recall-clipped)
    res = COCOEval(gt, "bbox").evaluate(dets)
    # cat 7: recall 0.5 -> AP ~ 50.5 (101-pt interp); cat 9: 100
    assert 70 < res["AP"] < 80
    # false positive hurts precision
    dets_fp = dets + [{"image_id": 2, "category_id": 9,
                       "bbox": [0, 0, 5, 5], "score": 0.95}]
    res_fp = COCOEval(gt, "bbox").evaluate(dets_fp)
    assert res_fp["AP"] < res["AP"]


def test_unsorted_detections_match_sorted():
    """Regression: the IoU matrix must be built in original detection
    order so _match_image's single score-sort permutation aligns rows.
    With the old double-permutation, 2 dts given in ascending-score order
    scored AP=100 instead of the correct 50 (ADVICE.md round 1)."""
    gt = make_gt()
    # one gt (img 1, cat 7); a bad low-IoU box with HIGHER score listed
    # after the good box -> the FP consumes rank 1, correct AP well below 100
    good = {"image_id": 1, "category_id": 7, "bbox": [10, 10, 30, 30],
            "score": 0.5}
    bad = {"image_id": 1, "category_id": 7, "bbox": [60, 60, 30, 30],
           "score": 0.9}
    res_asc = COCOEval(gt, "bbox").evaluate([good, bad])
    res_desc = COCOEval(gt, "bbox").evaluate([bad, good])
    for k in res_asc:
        assert res_asc[k] == pytest.approx(res_desc[k], nan_ok=True), k
    # sanity: the high-scored FP caps precision at rank 1
    assert res_asc["AP50"] < 100.0


def test_localization_quality_graded_by_iou():
    gt = make_gt()
    # box shifted by 8px: IoU = 660/1140 ~ 0.58 - counts at 0.5, not 0.75
    dets = [{"image_id": 1, "category_id": 7, "bbox": [18, 10, 30, 30],
             "score": 0.9},
            {"image_id": 1, "category_id": 9, "bbox": [50, 50, 20, 40],
             "score": 0.9},
            {"image_id": 2, "category_id": 7, "bbox": [0, 0, 50, 50],
             "score": 0.9}]
    res = COCOEval(gt, "bbox").evaluate(dets)
    assert res["AP50"] == pytest.approx(100.0)
    assert res["AP75"] < res["AP50"]


def test_polygon_rasterization_coco_protocol():
    """frPyObjects-exact rasterization: an integer-vertex rectangle
    polygon becomes the half-open pixel box [y0:y1, x0:x1] (the official
    COCO convention; cv2.fillPoly would include the x1/y1 boundary)."""
    poly = [np.array([3.0, 2.0, 9.0, 2.0, 9.0, 7.0, 3.0, 7.0])]
    r = rle.polygons_to_rle(poly, 12, 14)
    m = rle.decode(r)
    expect = np.zeros((12, 14), bool)
    expect[2:7, 3:9] = True
    np.testing.assert_array_equal(m, expect)
    assert rle.area(r) == 30
    # origin-anchored box: leading zero run
    r0 = rle.polygons_to_rle([np.array([0.0, 0, 5, 0, 5, 4, 0, 4])], 8, 8)
    m0 = rle.decode(r0)
    assert m0[:4, :5].all() and m0.sum() == 20
    # multiple polygons merge (union), non-integer vertices don't crash
    r2 = rle.polygons_to_rle(
        [np.array([0.0, 0, 3, 0, 3, 3, 0, 3]),
         np.array([4.7, 4.2, 7.9, 4.2, 7.9, 7.8, 4.7, 7.8])], 10, 10)
    m2 = rle.decode(r2)
    assert m2[:3, :3].all()
    assert m2.sum() > 9


def test_polygon_rasterization_close_to_fillpoly():
    """On a random simple polygon the protocol rasterization and
    cv2.fillPoly agree except on boundary pixels."""
    import cv2

    rng = np.random.RandomState(0)
    # star-shaped simple polygon around a center
    ang = np.sort(rng.uniform(0, 2 * np.pi, 12))
    rad = rng.uniform(8, 20, 12)
    cx, cy = 32, 30
    xs = cx + rad * np.cos(ang)
    ys = cy + rad * np.sin(ang)
    poly = np.stack([xs, ys], 1).reshape(-1)
    got = rle.decode(rle.polygons_to_rle([poly], 64, 64))
    ref = np.zeros((64, 64), np.uint8)
    cv2.fillPoly(ref, [np.round(poly.reshape(-1, 2)).astype(np.int32)], 1)
    ref = ref.astype(bool)
    diff = got ^ ref
    # differences confined to the dilated boundary of the reference mask
    er = cv2.erode(ref.astype(np.uint8), np.ones((3, 3), np.uint8))
    boundary = ref ^ er.astype(bool)
    boundary_dil = cv2.dilate(boundary.astype(np.uint8),
                              np.ones((3, 3), np.uint8)).astype(bool)
    assert not (diff & ~boundary_dil).any()
    assert diff.sum() < boundary.sum() * 2


def test_evaluate_box_proposals_ar():
    from centermask2_tpu.evaluation.coco_eval import evaluate_box_proposals

    gt = make_gt()  # 3 gts: img1 [10,10,40,40] + [50,50,70,90], img2 [0,0,50,50]
    proposals = {
        1: {"boxes": np.array([[10.0, 10, 40, 40], [50, 50, 70, 90]]),
            "objectness": np.array([0.9, 0.8])},
        2: {"boxes": np.array([[60.0, 60, 80, 80]]),
            "objectness": np.array([0.5])},
    }
    stats = evaluate_box_proposals(proposals, gt, limit=100)
    assert stats["num_pos"] == 3
    # 2 of 3 gts matched at IoU 1.0 -> recall 2/3 at every threshold
    np.testing.assert_allclose(stats["ar"], 2 / 3, rtol=1e-6)
    # limit=1 keeps only the top-scored proposal per image -> 1 of 3 gt hit
    stats1 = evaluate_box_proposals(proposals, gt, limit=1)
    np.testing.assert_allclose(stats1["ar"], 1 / 3, rtol=1e-6)
    # area filter: all three gts are 'small' (areas 900, 800, 2500 < 32^2=1024)?
    # 2500 > 1024 -> medium; small has 2 gts, 2 matched
    s = evaluate_box_proposals(proposals, gt, limit=100, area="small")
    assert s["num_pos"] == 2
    np.testing.assert_allclose(s["ar"], 1.0, rtol=1e-6)


def test_per_category_ap_and_csv_format():
    from centermask2_tpu.evaluation.coco_eval import print_csv_format

    gt = make_gt()
    dets = []
    for img_id, anns in gt.img_to_anns.items():
        for ann in anns:
            dets.append({"image_id": img_id, "category_id": ann["category_id"],
                         "bbox": list(ann["bbox"]), "score": 0.9})
    ev = COCOEval(gt, "bbox")
    res = ev.evaluate(dets)
    per_cat = ev.per_category_ap()
    assert set(per_cat) == {"a", "b"}
    assert per_cat["a"] == pytest.approx(100.0)
    assert per_cat["b"] == pytest.approx(100.0)
    text = print_csv_format({"bbox": res})
    assert "copypaste: Task: bbox" in text
    assert "copypaste: AP,AP50" in text


def test_segm_eval_and_mask_score_substitution():
    gt = make_gt()
    ev = COCOEvaluator(gt, tasks=("bbox", "segm"),
                       category_id_map={0: 7, 1: 9})
    # perfect masks, image 1
    m1 = np.zeros((100, 100), bool); m1[10:40, 10:40] = True
    m2 = np.zeros((100, 100), bool); m2[50:90, 50:70] = True
    ev.process(1, {
        "pred_boxes": np.array([[10, 10, 40, 40], [50, 50, 70, 90]], float),
        "scores": np.array([0.9, 0.8]),
        "mask_scores": np.array([0.85, 0.75]),
        "pred_classes": np.array([0, 1]),
        "pred_masks": np.stack([m1, m2]),
    })
    m3 = np.zeros((100, 100), bool); m3[0:50, 0:50] = True
    ev.process(2, {
        "pred_boxes": np.array([[0, 0, 50, 50]], float),
        "scores": np.array([0.95]),
        "mask_scores": np.array([0.9]),
        "pred_classes": np.array([0]),
        "pred_masks": np.stack([m3]),
    })
    res = ev.evaluate()
    assert res["bbox"]["AP"] == pytest.approx(100.0)
    # rasterization boundary conventions differ by <=1px from polygon gt
    assert res["segm"]["AP"] > 85
    # substitution effect: a low mask_score on a bad mask demotes it below
    # a good detection in segm ranking
    recs = [p for p in ev.predictions if p["image_id"] == 1]
    assert all("mask_score" in p for p in recs)


def _cs_gt_map():
    """64x64 instanceIds map: two cars (26000/26001, >=100px), a person
    (24000), a void strip (label 0), a tiny car (<100 px), and a car
    crowd region (semantic 26, no instance)."""
    g = np.zeros((64, 64), np.int64)  # label 0 = unlabeled (void)
    g[4:20, 4:20] = 26000
    g[30:50, 30:50] = 26001
    g[4:20, 40:60] = 24000
    g[55:58, 4:7] = 26002  # 9 px: below minRegionSize
    g[55:64, 40:60] = 26   # crowd car region
    return g


def _mask(g, iid):
    return g == iid


def test_cityscapes_scoring_perfect_and_missed():
    from centermask2_tpu.evaluation.cityscapes_scoring import score_instances

    g = _cs_gt_map()
    perfect = [[(_mask(g, 26000), 26, 0.9), (_mask(g, 26001), 26, 0.8),
                (_mask(g, 24000), 24, 0.95)]]
    res = score_instances([g], [perfect[0]])
    assert res["AP"] == pytest.approx(100.0)
    assert res["AP50"] == pytest.approx(100.0)
    assert res["AP-car"] == pytest.approx(100.0)
    # missing one of two cars: car AP = 0.5 at every overlap
    partial = [(_mask(g, 26000), 26, 0.9), (_mask(g, 24000), 24, 0.95)]
    res = score_instances([g], [partial])
    assert res["AP-car"] == pytest.approx(50.0)
    assert res["AP-person"] == pytest.approx(100.0)
    assert res["AP"] == pytest.approx(75.0)


def test_cityscapes_scoring_no_gt_class_excluded():
    """A class with predictions but zero gt instances is excluded from the
    average (official cityscapesscripts nan semantics), not scored 0."""
    from centermask2_tpu.evaluation.cityscapes_scoring import score_instances

    g = _cs_gt_map()
    fp_train = np.zeros_like(g, dtype=bool)
    fp_train[24:28, 4:20] = True  # 'train' (31) has no gt anywhere
    preds = [(_mask(g, 26000), 26, 0.9), (_mask(g, 26001), 26, 0.8),
             (_mask(g, 24000), 24, 0.95), (fp_train, 31, 0.99)]
    res = score_instances([g], [preds])
    assert res["AP"] == pytest.approx(100.0)  # train excluded, not 0
    assert np.isnan(res["AP-train"])


def test_cityscapes_scoring_ignore_regions():
    from centermask2_tpu.evaluation.cityscapes_scoring import score_instances

    g = _cs_gt_map()
    void_fp = np.zeros_like(g, dtype=bool)
    void_fp[0:3, 25:35] = True  # entirely on label-0 void
    crowd_fp = _mask(g, 26)  # entirely on the car crowd region
    small_fp = _mask(g, 26002)  # entirely on the too-small car gt
    preds = [(_mask(g, 26000), 26, 0.9), (_mask(g, 26001), 26, 0.8),
             (_mask(g, 24000), 24, 0.95),
             (void_fp, 26, 0.99), (crowd_fp, 26, 0.99),
             (small_fp, 26, 0.99)]
    res = score_instances([g], [preds])
    # all three extra predictions are forgiven (ignore overlap > threshold)
    assert res["AP"] == pytest.approx(100.0)
    # a genuine false positive on clean background does count
    real_fp = np.zeros_like(g, dtype=bool)
    real_fp[24:28, 4:20] = True
    g2 = g.copy()
    g2[24:28, 4:20] = 7  # label 7 (road): in-eval semantic, not void
    res2 = score_instances([g2], [preds + [(real_fp, 26, 0.99)]])
    assert res2["AP-car"] < 100.0


def test_cityscapes_instance_evaluator(tmp_path):
    from centermask2_tpu.evaluation.cityscapes_eval import (
        CityscapesInstanceEvaluator,
    )

    ev = CityscapesInstanceEvaluator(str(tmp_path / "preds"))
    m = np.zeros((64, 128), bool)
    m[10:30, 20:60] = True
    ev.process("frankfurt_000000_000294_leftImg8bit.png", {
        "pred_classes": np.array([2, 99]),  # car + out-of-vocab (skipped)
        "mask_scores": np.array([0.8, 0.5]),
        "pred_masks": np.stack([m, m]),
    })
    txt = tmp_path / "preds" / "frankfurt_000000_000294_leftImg8bit_pred.txt"
    assert txt.exists()
    lines = txt.read_text().splitlines()
    assert len(lines) == 1  # out-of-vocab skipped
    png, label_id, score = lines[0].split()
    assert label_id == "26" and abs(float(score) - 0.8) < 1e-6
    assert (tmp_path / "preds" / png).exists()
    res = ev.evaluate()
    assert "note" in res or "AP" in res


def test_event_storage(tmp_path):
    from centermask2_tpu.utils.events import EventStorage

    f = str(tmp_path / "metrics.jsonl")
    st = EventStorage(f)
    st.put_scalar("loss", 1.0)
    st.step()
    st.put_scalar("loss", 0.5)
    st.put_scalar("acc", 0.9)
    st.step()
    st.close()
    import json as _json

    lines = [_json.loads(l) for l in open(f)]
    assert lines[0]["loss"] == 1.0 and lines[1]["acc"] == 0.9
    assert st.history("loss") == [(0, 1.0), (1, 0.5)]
    assert st.median("loss") == 1.0


# ------------------------------------------------------------- keypoints
def _kpt_gt(n_img=1):
    """Synthetic keypoint dataset: person-style 17-keypoint gts."""
    rng = np.random.RandomState(0)
    images, anns = [], []
    aid = 1
    for i in range(1, n_img + 1):
        images.append({"id": i, "height": 200, "width": 200})
        for k in range(2):
            x0, y0, w, h = 20 + 80 * k, 30 + 60 * k, 60, 90
            kps = []
            for j in range(17):
                kps += [x0 + rng.rand() * w, y0 + rng.rand() * h, 2]
            anns.append({
                "id": aid, "image_id": i, "category_id": 1, "iscrowd": 0,
                "bbox": [x0, y0, w, h], "area": w * h,
                "keypoints": kps, "num_keypoints": 17,
            })
            aid += 1
    return COCOGt({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]})


def test_compute_oks_hand_values():
    from centermask2_tpu.evaluation.coco_eval import (COCO_KPT_SIGMAS,
                                                      compute_oks)

    gt = {"keypoints": [10.0, 10.0, 2] + [0.0, 0.0, 0] * 16,
          "bbox": [0.0, 0.0, 20.0, 20.0], "area": 400.0}
    # perfect prediction on the one visible keypoint -> OKS exp(0) = 1
    dt = np.array([[10.0, 10.0, 1.0] + [50.0, 50.0, 1.0] * 16])
    oks = compute_oks(dt, [gt], COCO_KPT_SIGMAS)
    assert oks[0, 0] == pytest.approx(1.0)
    # known offset: e = d^2 / var / (2*area); OKS = exp(-e)
    d = 4.0
    dt2 = np.array([[10.0 + d, 10.0, 1.0] + [0.0, 0.0, 0.0] * 16])
    var = (COCO_KPT_SIGMAS[0] * 2) ** 2
    expected = np.exp(-(d * d) / var / (2 * 400.0))
    oks2 = compute_oks(dt2, [gt], COCO_KPT_SIGMAS)
    assert oks2[0, 0] == pytest.approx(expected, rel=1e-9)
    # no visible gt keypoints: distance measured to the doubled bbox
    gt0 = dict(gt, keypoints=[10.0, 10.0, 0] + [0.0, 0.0, 0] * 16)
    inside = np.array([[15.0, 15.0, 1.0] * 17])
    assert compute_oks(inside, [gt0], COCO_KPT_SIGMAS)[0, 0] \
        == pytest.approx(1.0)


def test_keypoint_eval_perfect_ap100():
    gt = _kpt_gt()
    dets = []
    for img_id, anns in gt.img_to_anns.items():
        for ann in anns:
            dets.append({"image_id": img_id, "category_id": 1,
                         "keypoints": list(ann["keypoints"]), "score": 0.9})
    res = COCOEval(gt, "keypoints").evaluate(dets)
    assert res["AP"] == pytest.approx(100.0)
    assert res["AP50"] == pytest.approx(100.0)
    assert set(res) == {"AP", "AP50", "AP75", "APm", "APl", "AR20"}


def test_keypoint_eval_missed_gives_half_ap():
    gt = _kpt_gt()
    dets = []
    for img_id, anns in gt.img_to_anns.items():
        ann = anns[0]  # predict only the first of two gts
        dets.append({"image_id": img_id, "category_id": 1,
                     "keypoints": list(ann["keypoints"]), "score": 0.9})
    res = COCOEval(gt, "keypoints").evaluate(dets)
    # precision 1.0 up to recall 0.5 -> 101-point AP = 51/101
    assert res["AP"] == pytest.approx(100.0 * 51 / 101, abs=0.1)


def test_keypoint_eval_jittered_between():
    """A moderately jittered prediction scores below a perfect one but
    above a badly off one (OKS grading)."""
    gt = _kpt_gt()

    def run(noise):
        rng = np.random.RandomState(3)
        dets = []
        for img_id, anns in gt.img_to_anns.items():
            for ann in anns:
                kp = np.asarray(ann["keypoints"], np.float64).reshape(-1, 3)
                kp[:, :2] += rng.randn(17, 2) * noise
                dets.append({"image_id": img_id, "category_id": 1,
                             "keypoints": kp.flatten().tolist(),
                             "score": 0.9})
        return COCOEval(gt, "keypoints").evaluate(dets)["AP"]

    perfect, mid, bad = run(0.0), run(4.0), run(40.0)
    assert perfect == pytest.approx(100.0)
    assert perfect > mid > bad


def test_keypoint_gt_without_annotated_kpts_ignored():
    gt = _kpt_gt()
    # zero out one gt's keypoints: it must be ignored, so a perfect
    # prediction of the OTHER gt still yields AP 100
    ann0 = gt.img_to_anns[1][0]
    ann0["keypoints"] = [0.0, 0.0, 0] * 17
    ann0["num_keypoints"] = 0
    ann1 = gt.img_to_anns[1][1]
    dets = [{"image_id": 1, "category_id": 1,
             "keypoints": list(ann1["keypoints"]), "score": 0.9}]
    res = COCOEval(gt, "keypoints").evaluate(dets)
    assert res["AP"] == pytest.approx(100.0)


def test_evaluator_keypoints_task_end_to_end():
    """COCOEvaluator with the keypoints task: process() flattens
    pred_keypoints with the -0.5 pixel-index shift and evaluate()
    produces the keypoint metrics block."""
    gt = _kpt_gt()
    ev = COCOEvaluator(gt, tasks=("bbox", "keypoints"),
                       category_id_map={0: 1})
    for img_id, anns in gt.img_to_anns.items():
        kps, boxes = [], []
        for ann in anns:
            kp = np.asarray(ann["keypoints"], np.float32).reshape(17, 3).copy()
            kp[:, 2] = 0.7  # head emits probabilities in column 2
            kp[:, :2] += 0.5  # model coords are +0.5 vs annotation indices
            kps.append(kp)
            x, y, w, h = ann["bbox"]
            boxes.append([x, y, x + w, y + h])
        ev.process(img_id, {
            "pred_boxes": np.asarray(boxes, np.float32),
            "scores": np.full(len(boxes), 0.9, np.float32),
            "pred_classes": np.zeros(len(boxes), np.int64),
            "mask_scores": np.full(len(boxes), 0.9, np.float32),
            "pred_keypoints": np.stack(kps),
        })
    res = ev.evaluate()
    assert res["keypoints"]["AP"] == pytest.approx(100.0)
    assert res["bbox"]["AP"] == pytest.approx(100.0)


# ------------------------------------------------------ cityscapes semseg
def test_semseg_perfect_and_hand_computed_iou():
    from centermask2_tpu.evaluation.cityscapes_semseg import score_semseg

    gt = np.full((20, 30), 7, np.uint8)  # road
    gt[:, 15:] = 11  # building
    res = score_semseg([(gt.copy(), gt)])
    assert res["IoU"] == pytest.approx(100.0)
    assert res["IoU_sup"] == pytest.approx(100.0)
    assert res["IoU-road"] == pytest.approx(100.0)

    # half the building pixels predicted road:
    # road IoU = 300/(300+150) = 2/3; building = 150/300 = 1/2
    pred = gt.copy()
    pred[:10, 15:] = 7
    res = score_semseg([(pred, gt)])
    assert res["IoU-road"] == pytest.approx(100 * 300 / 450)
    assert res["IoU-building"] == pytest.approx(50.0)
    assert res["IoU"] == pytest.approx(100 * (300 / 450 + 0.5) / 2)


def test_semseg_void_gt_not_penalized():
    from centermask2_tpu.evaluation.cityscapes_semseg import score_semseg

    gt = np.full((10, 10), 7, np.uint8)
    gt[:, :5] = 0  # unlabeled (void)
    pred = np.full((10, 10), 7, np.uint8)  # predicts road everywhere
    res = score_semseg([(pred, gt)])
    # predictions on void gt are not false positives
    assert res["IoU-road"] == pytest.approx(100.0)


def test_semseg_category_pools_member_confusion():
    from centermask2_tpu.evaluation.cityscapes_semseg import score_semseg

    gt = np.full((10, 10), 12, np.uint8)  # wall
    pred = np.full((10, 10), 11, np.uint8)  # predicted building
    res = score_semseg([(pred, gt)])
    assert res["IoU-wall"] == pytest.approx(0.0)
    # both classes are 'construction': confusion inside the category is tp
    assert res["IoU_sup"] == pytest.approx(100.0)


def test_semseg_iiou_weights_instances_equally():
    from centermask2_tpu.evaluation.cityscapes_semseg import score_semseg

    # two person instances: 900 px matched, 100 px missed entirely
    gt = np.full((40, 40), 7, np.uint8)
    inst = np.full((40, 40), 7, np.int64)
    gt[:30, :30] = 24
    inst[:30, :30] = 24000
    gt[:10, 30:40] = 24
    inst[:10, 30:40] = 24001
    pred = np.full((40, 40), 7, np.uint8)
    pred[:30, :30] = 24  # only the big instance found
    res = score_semseg([(pred, gt)], [(pred, inst)])
    # plain IoU = 900/1000; iIoU weights both instances equally -> 1/2
    assert res["IoU-person"] == pytest.approx(90.0)
    assert res["iIoU_datanorm"] == pytest.approx(50.0)
    assert res["iIoU_sup_datanorm"] == pytest.approx(50.0)


def test_semseg_protocol_iiou_hand_computed():
    """Official-protocol iIoU uses the embedded cityscapesscripts
    train-split avgClassSize/avgCategorySize constants; hand-compute the
    weighted tp/fn with them and check score_semseg reproduces it (the
    fp term makes protocol and datanorm numerically distinct here)."""
    from centermask2_tpu.evaluation.cityscapes_semseg import (
        AVG_CATEGORY_SIZE, AVG_CLASS_SIZE, score_semseg)

    # person instances: 900 px fully matched + 100 px fully missed,
    # plus 100 false-positive person pixels on road ground truth
    gt = np.full((40, 40), 7, np.uint8)
    inst = np.full((40, 40), 7, np.int64)
    gt[:30, :30] = 24
    inst[:30, :30] = 24000
    gt[:10, 30:40] = 24
    inst[:10, 30:40] = 24001
    pred = np.full((40, 40), 7, np.uint8)
    pred[:30, :30] = 24
    pred[35:40, :20] = 24  # 100 px fp on road
    res = score_semseg([(pred, gt)], [(pred, inst)])

    # protocol: w = avgSize/instSize -> tp_w = 900*(A/900) = A,
    # fn_w = 100*(A/100) = A, fp = 100 (unweighted)
    a_cls = AVG_CLASS_SIZE["person"]
    assert res["iIoU"] == pytest.approx(100.0 * a_cls / (2 * a_cls + 100))
    a_cat = AVG_CATEGORY_SIZE["human"]
    assert res["iIoU_sup"] == pytest.approx(
        100.0 * a_cat / (2 * a_cat + 100))
    # datanorm: avg from the evaluated GT = (900+100)/2 = 500
    assert res["iIoU_datanorm"] == pytest.approx(
        100.0 * 500.0 / (2 * 500.0 + 100))
    assert res["iIoU_sup_datanorm"] == pytest.approx(
        100.0 * 500.0 / (2 * 500.0 + 100))
    # and they differ, pinning that two normalizers are really in play
    assert abs(res["iIoU"] - res["iIoU_datanorm"]) > 0.1


def test_cityscapes_semseg_evaluator_end_to_end(tmp_path):
    from PIL import Image

    from centermask2_tpu.evaluation.cityscapes_eval import \
        CityscapesSemSegEvaluator

    gt_dir = tmp_path / "gtFine" / "val" / "city"
    gt_dir.mkdir(parents=True)
    out_dir = tmp_path / "preds"

    # train-id map: evaluator converts trainIds -> labelIds
    gt = np.full((16, 16), 7, np.uint8)
    gt[8:, :] = 23  # sky
    Image.fromarray(gt).save(
        gt_dir / "city_000000_000019_gtFine_labelIds.png")

    ev = CityscapesSemSegEvaluator(str(out_dir))
    sem = np.zeros((16, 16), np.int64)  # trainId 0 = road
    sem[8:, :] = 10  # trainId 10 = sky
    ev.process("city_000000_000019_leftImg8bit.png", sem)
    res = ev.evaluate(str(tmp_path / "gtFine" / "val"))
    assert res["IoU"] == pytest.approx(100.0)
    assert res["IoU_sup"] == pytest.approx(100.0)
