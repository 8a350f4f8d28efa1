import json
import os

import numpy as np
import pytest
from PIL import Image

from centermask2_tpu.data.coco import (
    CocoDataset,
    load_train_example,
    mask_patch_from_polygons,
    train_batches,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("coco")
    img_dir = d / "images"
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in [(1, 200, 300), (2, 160, 240)]:
        img_id, h, w = i
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            img_dir / f"{img_id}.jpg")
        images.append({"id": img_id, "file_name": f"{img_id}.jpg",
                       "height": h, "width": w})
        anns.append({"id": len(anns) + 1, "image_id": img_id, "category_id": 5,
                     "iscrowd": 0, "bbox": [10, 20, 50, 60], "area": 3000,
                     "segmentation": [[10, 20, 60, 20, 60, 80, 10, 80]]})
    ann_path = d / "ann.json"
    with open(ann_path, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 5, "name": "x"},
                                  {"id": 9, "name": "y"}]}, f)
    return CocoDataset(str(ann_path), str(img_dir))


def test_dataset_basic(dataset):
    assert len(dataset) == 2
    assert dataset.cat_to_contiguous == {5: 0, 9: 1}


def test_load_train_example(dataset):
    ex = load_train_example(dataset, 1, short_edge=100, pad_to=(128, 160),
                            max_gt=8, patch_size=32)
    assert ex["image"].shape == (128, 160, 3)
    assert ex["gt_boxes"].shape == (8, 4)
    assert ex["gt_valid"].sum() == 1
    # image 200x300, short 100 -> scale 0.5: box [10,20,60,80] -> [5,10,30,40]
    np.testing.assert_allclose(ex["gt_boxes"][0], [5, 10, 30, 40], atol=1e-4)
    assert ex["gt_classes"][0] == 0
    # mask patch covers the full box (rectangle polygon ~ all ones)
    assert ex["gt_mask_patches"][0].mean() > 0.9


def test_hflip(dataset):
    ex = load_train_example(dataset, 1, short_edge=100, pad_to=(128, 160),
                            max_gt=8, patch_size=32, hflip=True)
    # flipped box: x0' = W - x1 = 150 - 30 = 120
    np.testing.assert_allclose(ex["gt_boxes"][0], [120, 10, 145, 40], atol=1e-4)


def test_train_batches(dataset):
    it = train_batches(dataset, 2, min_sizes=(100,), pad_to=(128, 160),
                       max_gt=4, patch_size=16, epochs=1)
    batch = next(it)
    assert batch["image"].shape == (2, 128, 160, 3)
    assert batch["gt_boxes"].shape == (2, 4, 4)
    assert batch["gt_mask_patches"].shape == (2, 4, 16, 16)


def test_train_batches_workers_deterministic(dataset):
    """DATALOADER.NUM_WORKERS thread pool must not change batch content:
    augmentation draws are serial, only decode is parallel."""
    kw = dict(min_sizes=(100, 120), pad_to=(128, 160), max_gt=4,
              patch_size=16, epochs=2, seed=3)
    serial = list(train_batches(dataset, 2, workers=0, **kw))
    pooled = list(train_batches(dataset, 2, workers=3, **kw))
    assert len(serial) == len(pooled) > 0
    for a, b in zip(serial, pooled):
        for k in ("image", "gt_boxes", "gt_classes", "gt_valid",
                  "gt_mask_patches", "image_size"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_prefetch_order_and_errors():
    from centermask2_tpu.data.prefetch import prefetch

    assert list(prefetch(iter(range(50)), depth=3)) == list(range(50))

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="producer failed"):
        next(it)


def test_prefetch_abandoned_consumer_stops_producer():
    """Closing the consumer mid-stream must release the producer thread
    (stop-aware puts), not leave it blocked on a full queue."""
    import threading
    import time

    from centermask2_tpu.data.prefetch import prefetch

    before = {t.ident for t in threading.enumerate()}
    it = prefetch(iter(range(1000)), depth=1)
    assert next(it) == 0
    it.close()  # GeneratorExit -> finally -> stop.set()
    deadline = time.time() + 5.0
    while time.time() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.ident not in before and t.name == "batch-prefetch"
                 and t.is_alive()]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive, "prefetch producer thread still alive after close()"


def test_prefetch_survives_slow_consumer():
    """A consumer that stalls with the queue full (periodic eval, first
    jit compile) must not be treated as abandonment: every remaining
    item still arrives afterwards. Regression for the idle-timeout
    silent-hang (ADVICE r3, high)."""
    import time

    from centermask2_tpu.data.prefetch import prefetch

    it = prefetch(iter(range(8)), depth=1)
    got = [next(it)]
    time.sleep(1.0)  # queue full the whole time; producer must wait
    got += list(it)
    assert got == list(range(8))


def test_prefetch_detects_dead_producer(monkeypatch):
    """If the producer thread dies without delivering its sentinel the
    consumer must raise, never block forever on the queue."""
    import queue as queue_mod

    from centermask2_tpu.data import prefetch as mod

    # Force the sentinel put to fail so the thread exits sentinel-less.
    class DroppyQueue(queue_mod.Queue):
        def put(self, item, *a, **kw):
            if item is mod._DONE or isinstance(item, BaseException):
                raise SystemExit  # kills the producer thread silently
            super().put(item, *a, **kw)

    monkeypatch.setattr(mod.queue, "Queue", DroppyQueue)
    it = mod.prefetch(iter([1]), depth=1)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="died without a sentinel"):
        next(it)


def test_train_batches_range_sampling(dataset):
    """INPUT.MIN_SIZE_TRAIN_SAMPLING='range' draws short edges uniformly
    from [min, max] instead of only the listed sizes (d2
    ResizeShortestEdge sample_style)."""
    seen = set()
    it = train_batches(dataset, 2, min_sizes=(64, 128), pad_to=(160, 256),
                       max_gt=4, patch_size=16, epochs=30, seed=1,
                       sampling="range")
    for batch in it:
        # recover the drawn short edge from the resized content height
        seen.update(batch["image_size"][:, 0].tolist())
    between = [s for s in seen if 64 < s < 128]
    assert between, f"range sampling never drew between the endpoints: {seen}"

    # choice sampling draws only the listed sizes
    seen_c = set()
    for batch in train_batches(dataset, 2, min_sizes=(64, 128),
                               pad_to=(160, 256), max_gt=4, patch_size=16,
                               epochs=10, seed=1, sampling="choice"):
        seen_c.update(batch["image_size"][:, 0].tolist())
    assert all(s in (64.0, 128.0, 96.0, 192.0) or s <= 192 for s in seen_c)


def test_load_train_example_keypoints(dataset, tmp_path):
    """Keypoint GT loading (MODEL.KEYPOINT_ON training): scale to the
    resized image, d2 hflip semantics (mirror x, swap left/right
    members, keep visibility)."""
    import json as _json

    from centermask2_tpu.data.coco import COCO_KEYPOINT_HFLIP_PAIRS

    (tmp_path / "images").mkdir()
    rng = np.random.RandomState(1)
    Image.fromarray(rng.randint(0, 255, (200, 300, 3), np.uint8)).save(
        tmp_path / "images" / "1.jpg")
    kp = np.zeros((17, 3), np.float32)
    kp[0] = [100, 50, 2]   # nose (no flip pair)
    kp[1] = [90, 40, 2]    # left eye
    kp[2] = [110, 40, 1]   # right eye
    kp[15] = [80, 180, 2]  # left ankle
    ann = {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
           "bbox": [10, 20, 120, 160], "area": 100,
           "segmentation": [[10, 20, 130, 20, 130, 180, 10, 180]],
           "keypoints": kp.flatten().tolist(), "num_keypoints": 4}
    with open(tmp_path / "ann.json", "w") as f:
        _json.dump({"images": [{"id": 1, "file_name": "1.jpg",
                                "height": 200, "width": 300}],
                    "annotations": [ann],
                    "categories": [{"id": 1, "name": "person"}]}, f)
    ds = CocoDataset(str(tmp_path / "ann.json"), str(tmp_path / "images"))

    ex = load_train_example(ds, 1, short_edge=100, pad_to=(128, 160),
                            max_gt=4, patch_size=16, with_keypoints=True)
    got = ex["gt_keypoints"][0]  # scale 0.5
    np.testing.assert_allclose(got[0], [50, 25, 2], atol=1e-5)
    np.testing.assert_allclose(got[1], [45, 20, 2], atol=1e-5)
    np.testing.assert_allclose(got[2], [55, 20, 1], atol=1e-5)
    np.testing.assert_allclose(got[15], [40, 90, 2], atol=1e-5)
    assert (got[3:15] == 0).all() and (got[16] == 0).all()

    exf = load_train_example(ds, 1, short_edge=100, pad_to=(128, 160),
                             max_gt=4, patch_size=16, with_keypoints=True,
                             hflip=True)
    gf = exf["gt_keypoints"][0]  # resized W=150; left/right eyes swap
    np.testing.assert_allclose(gf[0], [150 - 50, 25, 2], atol=1e-5)
    np.testing.assert_allclose(gf[1], [150 - 55, 20, 1], atol=1e-5)  # <- was right eye
    np.testing.assert_allclose(gf[2], [150 - 45, 20, 2], atol=1e-5)  # <- was left eye
    # left ankle (15) swaps with right ankle (16); the unset right
    # ankle lands on 15 and is zeroed (d2: not-labeled keypoints -> 0)
    np.testing.assert_allclose(gf[16], [150 - 40, 90, 2], atol=1e-5)
    assert (gf[15] == 0).all()
    assert (1, 2) in COCO_KEYPOINT_HFLIP_PAIRS

    # batch iterator surfaces the field
    it = train_batches(ds, 1, min_sizes=(100,), pad_to=(128, 160),
                       max_gt=4, patch_size=16, epochs=1,
                       with_keypoints=True, random_flip="none")
    batch = next(it)
    assert batch["gt_keypoints"].shape == (1, 4, 17, 3)


def test_filter_images_with_few_keypoints(tmp_path):
    """d2 filter_images_with_few_keypoints semantics
    (MODEL.ROI_KEYPOINT_HEAD.MIN_KEYPOINTS_PER_IMAGE)."""
    import json as _json

    from centermask2_tpu.data.coco import filter_images_with_few_keypoints

    (tmp_path / "images").mkdir()
    images, anns = [], []
    for i, nvis in [(1, 0), (2, 1), (3, 5)]:
        Image.new("RGB", (40, 40)).save(tmp_path / "images" / f"{i}.jpg")
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "height": 40, "width": 40})
        kp = [0.0, 0.0, 0] * 17
        for k in range(nvis):
            kp[k * 3: k * 3 + 3] = [5.0 + k, 5.0, 2]
        anns.append({"id": i, "image_id": i, "category_id": 1, "iscrowd": 0,
                     "bbox": [1, 1, 20, 20], "area": 400,
                     "keypoints": kp, "num_keypoints": nvis})
    with open(tmp_path / "ann.json", "w") as f:
        _json.dump({"images": images, "annotations": anns,
                    "categories": [{"id": 1, "name": "person"}]}, f)
    ds = CocoDataset(str(tmp_path / "ann.json"), str(tmp_path / "images"))
    assert filter_images_with_few_keypoints(ds, 1) == 1
    assert ds.ids == [2, 3]
    assert filter_images_with_few_keypoints(ds, 2) == 1
    assert ds.ids == [3]
    assert filter_images_with_few_keypoints(ds, 0) == 0


def test_train_batches_tight_pad_aspect_grouping(tmp_path):
    """TPU.TRAIN_TIGHT_PAD: batches are aspect-ratio grouped (d2
    build.py aspect_ratio_grouping) and padded to the quantized tight
    canvas of the batch — full batches are single-orientation, the
    canvas set stays tiny (bounded compile count), and padding beyond
    each image is zero."""
    d = tmp_path / "coco_mixed"
    img_dir = d / "images"
    os.makedirs(img_dir)
    rng = np.random.RandomState(1)
    images, anns = [], []
    sizes = [(100, 150)] * 4 + [(150, 100)] * 4  # 4 landscape + 4 portrait
    for i, (h, w) in enumerate(sizes, start=1):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            img_dir / f"{i}.jpg")
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "height": h, "width": w})
        anns.append({"id": i, "image_id": i, "category_id": 5,
                     "iscrowd": 0, "bbox": [10, 20, 40, 50], "area": 2000,
                     "segmentation": [[10, 20, 50, 20, 50, 70, 10, 70]]})
    with open(d / "ann.json", "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 5, "name": "x"}]}, f)
    ds = CocoDataset(str(d / "ann.json"), str(img_dir))

    batches = list(train_batches(
        ds, 2, min_sizes=(96,), max_size=160, pad_to=(160, 160),
        max_gt=4, patch_size=16, epochs=1, seed=0, tight_pad=True))
    assert len(batches) == 4
    canvases = set()
    orientations = []
    for b in batches:
        H, W = b["image"].shape[1:3]
        assert H % 32 == 0 and W % 32 == 0
        canvases.add((H, W))
        orientations.append(H > W)
        for k in range(b["image"].shape[0]):
            ih, iw = b["image_size"][k]
            assert ih <= H and iw <= W
            # padding beyond the resized image is exactly zero
            assert not b["image"][k, ih:, :].any()
            assert not b["image"][k, :, iw:].any()
            v = b["gt_valid"][k]
            assert (b["gt_boxes"][k][v][:, 2] <= iw + 1e-3).all()
            assert (b["gt_boxes"][k][v][:, 3] <= ih + 1e-3).all()
    # landscape batches on the (96,160) rect, portrait on (160,96):
    # strictly smaller than the square, single-orientation each
    assert canvases == {(96, 160), (160, 96)}
    assert sorted(orientations) == [False, False, True, True]
