"""COCO dataset loading for training and evaluation.

Host-side pipeline replacing detectron2's dataloader as the reference
uses it (build_detection_test_loader at tester.py:122; training mapper
with ResizeShortestEdge multi-scale + flip per
Base-CenterMask-VoVNet.yaml:34-35):

- reads COCO-format json without pycocotools,
- resizes (PIL bilinear, exact reference math), flips, normalizes, pads
  to a fixed bucket,
- emits fixed-capacity GroundTruth: padded boxes/classes/valid plus
  per-instance mask patches rasterized once over each gt box (the
  device-side crop_and_resize consumes these; models/meta.py).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .preprocess import (
    PIXEL_MEAN,
    PIXEL_STD,
    compute_resize_shape,
    read_image_bgr,
)


class CocoDataset:
    def __init__(self, json_path: str, image_root: str,
                 filter_empty: bool = True):
        with open(json_path) as f:
            self.dataset = json.load(f)
        self.image_root = image_root
        self.imgs = {im["id"]: im for im in self.dataset["images"]}
        cat_ids = sorted(c["id"] for c in self.dataset.get("categories", []))
        # dataset category id -> contiguous [0, C)
        self.cat_to_contiguous = {cid: i for i, cid in enumerate(cat_ids)}
        self.contiguous_to_cat = {i: cid for cid, i in self.cat_to_contiguous.items()}
        anns = defaultdict(list)
        for a in self.dataset.get("annotations", []):
            if a.get("iscrowd", 0):
                continue  # crowd regions are eval-only ignore regions
            anns[a["image_id"]].append(a)
        self.img_to_anns = anns
        ids = sorted(self.imgs.keys())
        if filter_empty:
            ids = [i for i in ids if len(anns[i]) > 0]
        self.ids = ids

    def __len__(self) -> int:
        return len(self.ids)

    def image_path(self, img_id: int) -> str:
        return os.path.join(self.image_root, self.imgs[img_id]["file_name"])


def rasterize_polygons(polygons: List, h: int, w: int) -> np.ndarray:
    import cv2

    mask = np.zeros((h, w), np.uint8)
    for p in polygons:
        pts = np.asarray(p, np.float64).reshape(-1, 2)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask


def mask_patch_from_polygons(
    polygons: List, box: np.ndarray, patch_size: int
) -> np.ndarray:
    """Rasterize a gt instance into a (P, P) patch over its box frame."""
    import cv2

    x0, y0, x1, y1 = box
    w = max(x1 - x0, 1e-3)
    h = max(y1 - y0, 1e-3)
    mask = np.zeros((patch_size, patch_size), np.uint8)
    for p in polygons:
        pts = np.asarray(p, np.float64).reshape(-1, 2).copy()
        pts[:, 0] = (pts[:, 0] - x0) / w * patch_size
        pts[:, 1] = (pts[:, 1] - y0) / h * patch_size
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask.astype(np.float32)


# detectron2's COCO person-keypoint horizontal-flip map: left/right
# member indices to swap (d2 data/detection_utils.py create_keypoint_hflip
# _indices; 0=nose has no pair)
COCO_KEYPOINT_HFLIP_PAIRS = ((1, 2), (3, 4), (5, 6), (7, 8), (9, 10),
                             (11, 12), (13, 14), (15, 16))


def filter_images_with_few_keypoints(ds: CocoDataset, min_kp: int) -> int:
    """Drop training images whose annotations carry fewer than ``min_kp``
    visible keypoints in total (d2 filter_images_with_few_keypoints —
    MODEL.ROI_KEYPOINT_HEAD.MIN_KEYPOINTS_PER_IMAGE). Mutates ds.ids;
    returns the number of images removed."""
    if min_kp <= 0:
        return 0

    def n_visible(img_id):
        n = 0
        for a in ds.img_to_anns[img_id]:
            kp = a.get("keypoints")
            if kp:
                n += int(sum(1 for v in kp[2::3] if v > 0))
        return n

    before = len(ds.ids)
    ds.ids = [i for i in ds.ids if n_visible(i) >= min_kp]
    return before - len(ds.ids)


def load_train_example(
    ds: CocoDataset,
    img_id: int,
    *,
    short_edge: int,
    max_size: int = 1333,
    pad_to: Tuple[int, int],
    max_gt: int = 100,
    patch_size: int = 112,
    hflip: bool = False,
    with_keypoints: bool = False,
    num_keypoints: int = 17,
) -> Dict[str, np.ndarray]:
    """One training example: resized/flipped/normalized image + padded GT.
    ``with_keypoints`` adds "gt_keypoints" (max_gt, K, 3) x/y/vis in
    network input coords (MODEL.KEYPOINT_ON training; flip swaps the
    COCO left/right members like d2 transform_keypoint_annotations)."""
    from PIL import Image

    img = read_image_bgr(ds.image_path(img_id))
    h, w = img.shape[:2]
    newh, neww = compute_resize_shape(h, w, short_edge, max_size)
    pil = Image.fromarray(img).resize((neww, newh), Image.BILINEAR)
    img = np.asarray(pil).astype(np.float32)
    sx, sy = neww / w, newh / h

    if hflip:
        img = img[:, ::-1].copy()

    img = (img - PIXEL_MEAN) / PIXEL_STD
    ph, pw = pad_to
    padded = np.zeros((ph, pw, 3), np.float32)
    padded[:newh, :neww] = img[:ph, :pw]

    boxes = np.zeros((max_gt, 4), np.float32)
    classes = np.zeros((max_gt,), np.int32)
    valid = np.zeros((max_gt,), bool)
    patches = np.zeros((max_gt, patch_size, patch_size), np.float32)
    keypoints = (np.zeros((max_gt, num_keypoints, 3), np.float32)
                 if with_keypoints else None)

    anns = ds.img_to_anns[img_id][:max_gt]
    for i, ann in enumerate(anns):
        x, y, bw, bh = ann["bbox"]
        box = np.array([x * sx, y * sy, (x + bw) * sx, (y + bh) * sy],
                       np.float32)
        seg = ann.get("segmentation") or []
        if hflip:
            box = np.array([neww - box[2], box[1], neww - box[0], box[3]],
                           np.float32)
        if box[2] <= box[0] or box[3] <= box[1]:
            continue
        boxes[i] = box
        classes[i] = ds.cat_to_contiguous[ann["category_id"]]
        valid[i] = True
        if seg and isinstance(seg, list):
            scaled = []
            for p in seg:
                p = np.asarray(p, np.float64).reshape(-1, 2)
                p = p * np.array([sx, sy])
                if hflip:
                    p[:, 0] = neww - p[:, 0]
                scaled.append(p.reshape(-1))
            patches[i] = mask_patch_from_polygons(scaled, boxes[i], patch_size)
        if keypoints is not None and ann.get("keypoints"):
            kp = np.asarray(ann["keypoints"], np.float32).reshape(-1, 3)
            kp = kp[:num_keypoints]
            kp[:, 0] *= sx
            kp[:, 1] *= sy
            if hflip:
                # d2 transform_keypoint_annotations: mirror x, swap
                # left/right members, keep visibility
                kp[:, 0] = neww - kp[:, 0]
                for a, b in COCO_KEYPOINT_HFLIP_PAIRS:
                    if a < len(kp) and b < len(kp):
                        kp[[a, b]] = kp[[b, a]]
            kp[kp[:, 2] == 0] = 0  # d2: zero not-labeled keypoints
            keypoints[i, : len(kp)] = kp

    out = {
        "image": padded,
        "gt_boxes": boxes,
        "gt_classes": classes,
        "gt_valid": valid,
        "gt_mask_patches": patches,
        "image_size": np.array([newh, neww], np.int32),
        "image_id": img_id,
    }
    if keypoints is not None:
        out["gt_keypoints"] = keypoints
    return out


def train_batches(
    ds: CocoDataset,
    batch_size: int,
    *,
    min_sizes: Sequence[int] = (640, 672, 704, 736, 768, 800),
    max_size: int = 1333,
    pad_to: Tuple[int, int] = (1344, 1344),
    max_gt: int = 100,
    patch_size: int = 112,
    seed: int = 0,
    epochs: Optional[int] = None,
    workers: int = 0,
    random_flip: str = "horizontal",  # INPUT.RANDOM_FLIP: horizontal|none
    sampling: str = "choice",  # INPUT.MIN_SIZE_TRAIN_SAMPLING: choice|range
    with_keypoints: bool = False,  # MODEL.KEYPOINT_ON: add gt_keypoints
    tight_pad: bool = False,  # TPU.TRAIN_TIGHT_PAD: per-batch tight canvas
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite (or epochs-bounded) shuffled batch iterator with
    multi-scale jitter + random horizontal flip (INPUT.MIN_SIZE_TRAIN).

    ``sampling`` follows d2 ResizeShortestEdge: "choice" draws the short
    edge from ``min_sizes``; "range" draws uniformly from
    [min(min_sizes), max(min_sizes)].

    ``workers > 0`` decodes/resizes the batch's images on a thread pool
    (DATALOADER.NUM_WORKERS — the reference's multi-worker DataLoader);
    augmentation draws happen serially first, so batches are
    bit-identical to workers=0 regardless of thread timing.

    ``tight_pad`` reproduces detectron2's training geometry instead of
    the fixed deploy square: batches are aspect-ratio grouped (d2's
    dataloader default, build.py aspect_ratio_grouping) and padded to
    the quantized tight canvas covering the batch (s2d_serving_canvas of
    the max resized dims, with short = the largest multi-scale draw) —
    at most 4 padded shapes => at most 4 compiled train programs, and
    ~30-40% fewer pixels per step than the square for typical COCO.
    Step time scales ~linearly with canvas area; padding locations are
    FCOS negatives exactly as in d2. Epoch tails that cannot fill an
    orientation group are batched mixed (canvas covers both).
    """
    assert random_flip in ("horizontal", "none"), random_flip
    assert sampling in ("choice", "range"), sampling
    pool = None
    if workers > 0:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=workers)
    try:
        yield from _train_batches_inner(
            ds, batch_size, min_sizes=min_sizes, max_size=max_size,
            pad_to=pad_to, max_gt=max_gt, patch_size=patch_size, seed=seed,
            epochs=epochs, random_flip=random_flip, sampling=sampling,
            pool=pool, with_keypoints=with_keypoints, tight_pad=tight_pad)
    finally:
        if pool is not None:
            pool.shutdown(wait=False)


def _train_batches_inner(ds, batch_size, *, min_sizes, max_size, pad_to,
                         max_gt, patch_size, seed, epochs, random_flip,
                         sampling, pool, with_keypoints=False,
                         tight_pad=False):
    rng = np.random.RandomState(seed)
    lo, hi = int(min(min_sizes)), int(max(min_sizes))

    def draw_short_edge():
        if sampling == "range":  # d2: uniform over [lo, hi]
            return int(rng.randint(lo, hi + 1))
        return int(rng.choice(min_sizes))

    def emit(img_ids):
        jobs = [
            dict(img_id=int(img_id),
                 short_edge=draw_short_edge(),
                 hflip=(random_flip == "horizontal"
                        and bool(rng.rand() < 0.5)))
            for img_id in img_ids
        ]
        batch_pad = pad_to
        if tight_pad:
            from .preprocess import s2d_serving_canvas

            mh = mw = 1
            for job in jobs:
                im = ds.imgs[job["img_id"]]
                nh, nw = compute_resize_shape(
                    im["height"], im["width"], job["short_edge"], max_size)
                mh, mw = max(mh, nh), max(mw, nw)
            # quantize with short = the LARGEST multi-scale draw so the
            # canvas set is stable across draws (<= 4 shapes); the cap
            # is per-axis so a non-square pad_to keeps its full width
            batch_pad = s2d_serving_canvas(mh, mw, pad_to, hi)

        def load(job):
            return load_train_example(
                ds, job["img_id"], short_edge=job["short_edge"],
                max_size=max_size, pad_to=batch_pad, max_gt=max_gt,
                patch_size=patch_size, hflip=job["hflip"],
                with_keypoints=with_keypoints)

        examples = list(pool.map(load, jobs) if pool else map(load, jobs))
        keys = ["image", "gt_boxes", "gt_classes", "gt_valid",
                "gt_mask_patches", "image_size"]
        if with_keypoints:
            keys.append("gt_keypoints")
        batch = {k: np.stack([e[k] for e in examples]) for k in keys}
        batch["image_ids"] = [e["image_id"] for e in examples]
        return batch

    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(ds.ids)
        if not tight_pad:
            for start in range(0, len(order) - batch_size + 1, batch_size):
                yield emit(order[start:start + batch_size])
        else:
            # aspect-ratio grouping (d2 build.py aspect_ratio_grouping):
            # two queues by original orientation; a full queue forms a
            # batch, so landscape batches pad to (short, long) and
            # portrait to (long, short) instead of the mixed square
            queues = {True: [], False: []}
            for img_id in order:
                im = ds.imgs[int(img_id)]
                q = queues[im["height"] > im["width"]]
                q.append(img_id)
                if len(q) == batch_size:
                    yield emit(q)
                    q.clear()
            # epoch tail: mixed leftovers (canvas covers both)
            rest = queues[True] + queues[False]
            for start in range(0, len(rest) - batch_size + 1, batch_size):
                yield emit(rest[start:start + batch_size])
        epoch += 1
