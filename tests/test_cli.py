"""End-to-end CLI smoke tests (subprocess, CPU, tiny configs).

Locks every tool entry point: infer.py (single / tight-compute /
data-parallel tight), train_net.py (tight-pad and square geometries,
keypoints), the AP-parity drill (convert_weights -> orbax -> infer),
visualize.py, the offline bin pipeline (preprocess_to_bin ->
postprocess_bins), the L7 debug tools (parity_check, check_layers,
measure), and export_model.py. Tiny synthetic COCO data, V-19-slim
backbone, small canvases — each model-bearing run is compile-dominated
(~15 s - 2 min on CPU with the persistent compilation cache).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    from PIL import Image, ImageDraw

    root = tmp_path_factory.mktemp("ds")
    (root / "images").mkdir()
    images, anns = [], []
    for i in range(2):
        w, h = 300, 260
        im = Image.new("RGB", (w, h), (30 + 60 * i, 90, 140))
        d = ImageDraw.Draw(im)
        x0, y0, bw, bh = 40 + 30 * i, 50, 120, 90
        d.rectangle([x0, y0, x0 + bw, y0 + bh], fill=(220, 60 + 80 * i, 40))
        im.save(root / "images" / f"{i:012d}.jpg")
        images.append({"id": i, "file_name": f"{i:012d}.jpg",
                       "width": w, "height": h})
        anns.append({
            "id": i + 1, "image_id": i, "category_id": 1,
            "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0,
            "segmentation": [[x0, y0, x0 + bw, y0, x0 + bw, y0 + bh,
                              x0, y0 + bh]]})
    with open(root / "ann.json", "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "thing"}]}, f)
    return root


def _run(args, n_devices=1):
    env = dict(os.environ)
    env["CM2_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={n_devices}")
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)


TINY_OPTS = [
    "MODEL.VOVNET.CONV_BODY", "V-19-slim-eSE",
    "TPU.NMS_CANDIDATES", "50", "TPU.COMPUTE_DTYPE", "float32",
]


@pytest.mark.slow
def test_infer_cli_end_to_end(tiny_coco, tmp_path):
    out = tmp_path / "out"
    r = _run([
        "tools/infer.py",
        "--config-file", "configs/centermask/zy_model_config.yaml",
        "--ann", str(tiny_coco / "ann.json"),
        "--image-root", str(tiny_coco / "images"),
        "--output-dir", str(out),
        "TPU.FIXED_EDGE_SIZE", "320",
        "MODEL.FCOS.PRE_NMS_TOPK_TEST", "50",
        "INPUT.MIN_SIZE_TEST", "256", "INPUT.MAX_SIZE_TEST", "312",
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = json.loads((out / "metrics.json").read_text())
    assert set(metrics) >= {"bbox", "segm", "box_proposals"}
    # reference copypaste format: fixed columns, no per-category keys
    csv_lines = [l for l in r.stdout.splitlines() if l.startswith("copypaste:")]
    assert "copypaste: AP,AP50,AP75,APs,APm,APl,AR1,AR10,AR100" in csv_lines
    assert (out / "coco_instances_results.json").exists()


@pytest.mark.slow
def test_visualize_cli(tiny_coco, tmp_path):
    """tools/visualize.py end to end: preprocess -> model -> postprocess
    -> cv2 rendering at the original size (reference visualizer.py
    analog). Random weights: asserts the tool runs and writes the file,
    whatever the detection count."""
    out = tmp_path / "vis.jpg"
    r = _run([
        "tools/visualize.py",
        "--image", str(tiny_coco / "images" / "000000000000.jpg"),
        "--config-file", "configs/centermask/zy_model_config.yaml",
        "--output", str(out),
        "--score-thresh", "0.0",
        "TPU.FIXED_EDGE_SIZE", "320",
        "MODEL.FCOS.PRE_NMS_TOPK_TEST", "50",
        "INPUT.MIN_SIZE_TEST", "256", "INPUT.MAX_SIZE_TEST", "312",
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-3000:]
    assert out.exists() and out.stat().st_size > 1000
    assert "wrote" in r.stdout


@pytest.mark.slow
def test_infer_cli_tight_compute(tiny_coco, tmp_path):
    """--tight-compute: the device program runs at each image's quantized
    tight canvas (s2d_serving_canvas) instead of the fixed square — the
    d2-eval-equivalent workload. The 300x260 and landscape-resized inputs
    exercise a non-square canvas end to end through decode/ROI/postproc."""
    out = tmp_path / "out_tight"
    r = _run([
        "tools/infer.py",
        "--config-file", "configs/centermask/zy_model_config.yaml",
        "--ann", str(tiny_coco / "ann.json"),
        "--image-root", str(tiny_coco / "images"),
        "--output-dir", str(out),
        "--tight-compute",
        "TPU.FIXED_EDGE_SIZE", "320",
        "TPU.S2D_STEM_INPUT", "True",
        "MODEL.FCOS.PRE_NMS_TOPK_TEST", "50",
        "INPUT.MIN_SIZE_TEST", "256", "INPUT.MAX_SIZE_TEST", "312",
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = json.loads((out / "metrics.json").read_text())
    assert set(metrics) >= {"bbox", "segm", "box_proposals"}
    assert (out / "coco_instances_results.json").exists()


@pytest.mark.slow
def test_infer_cli_tight_compute_data_parallel(tiny_coco, tmp_path):
    """--tight-compute composes with --data-parallel: batches are grouped
    by quantized serving canvas (both 300x260 images land on the same
    rect (256,320) canvas) and the sharded batch runs at that canvas on
    the 2-device CPU mesh."""
    out = tmp_path / "out_tight_dp"
    r = _run([
        "tools/infer.py",
        "--config-file", "configs/centermask/zy_model_config.yaml",
        "--ann", str(tiny_coco / "ann.json"),
        "--image-root", str(tiny_coco / "images"),
        "--output-dir", str(out),
        "--tight-compute", "--data-parallel", "--batch-size", "2",
        "TPU.FIXED_EDGE_SIZE", "320",
        "TPU.S2D_STEM_INPUT", "True",
        "MODEL.FCOS.PRE_NMS_TOPK_TEST", "50",
        "INPUT.MIN_SIZE_TEST", "256", "INPUT.MAX_SIZE_TEST", "312",
    ] + TINY_OPTS, n_devices=2)
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = json.loads((out / "metrics.json").read_text())
    assert set(metrics) >= {"bbox", "segm", "box_proposals"}


@pytest.mark.slow
def test_train_cli_end_to_end(tiny_coco, tmp_path):
    # TPU.TRAIN_TIGHT_PAD exercises the d2-geometry training path
    # (aspect-grouped batches, per-batch tight canvas — both 300x260
    # images train on the rect (224,256) canvas); the fixed-square
    # training path stays covered by test_train_cli_keypoint_end_to_end
    out = tmp_path / "train_out"
    r = _run([
        "tools/train_net.py",
        "--ann", str(tiny_coco / "ann.json"),
        "--image-root", str(tiny_coco / "images"),
        "--val-ann", str(tiny_coco / "ann.json"),  # TEST.EVAL_PERIOD path
        "--max-iter", "2", "--log-every", "1",
        "TEST.EVAL_PERIOD", "2",
        "INPUT.MIN_SIZE_TEST", "224", "INPUT.MAX_SIZE_TEST", "250",
        "MODEL.MASK_ON", "True", "MODEL.MASKIOU_ON", "True",
        "TPU.FIXED_EDGE_SIZE", "256",
        "TPU.TRAIN_TIGHT_PAD", "True",
        "MODEL.FCOS.PRE_NMS_TOPK_TRAIN", "50",
        "MODEL.FCOS.POST_NMS_TOPK_TRAIN", "20",
        "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "32",
        "TPU.MAX_FG_PROPOSALS", "8", "TPU.MAX_GT_INSTANCES", "8",
        "SOLVER.IMS_PER_BATCH", "2",
        "INPUT.MIN_SIZE_TRAIN", "(224,)", "INPUT.MAX_SIZE_TRAIN", "250",
        "SOLVER.CHECKPOINT_PERIOD", "2",
        "OUTPUT_DIR", str(out),
    ] + TINY_OPTS, n_devices=2)
    assert r.returncode == 0, r.stderr[-3000:]
    lines = (out / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 2
    recs = [json.loads(l) for l in lines]
    assert np.isfinite(recs[-1].get("total_loss", recs[-2]["total_loss"]))
    assert (out / "checkpoints" / "step_2").exists()
    # periodic eval logged AP scalars (TEST.EVAL_PERIOD)
    assert any("bbox/AP" in r for r in recs), r.stderr[-2000:]
    assert "eval @2:" in r.stdout


@pytest.mark.slow
def test_ap_parity_drill(tiny_coco, tmp_path):
    """The AP-parity readiness drill (README "AP-parity drill" section),
    exercised end to end in CI on synthetic data: a reference-key-schema
    .pth on disk -> tools/convert_weights.py (must report FULL key
    coverage) -> tools/infer.py --weights <orbax_dir> -> AP table. With
    real COCO val2017 and the released centermask2-V-39-eSE-FPN-ms-3x
    checkpoint, the identical sequence produces the
    reference-README:171-173 comparison numbers."""
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_e2e_torch import _make_state_dict

    sd = _make_state_dict(np.random.RandomState(11), num_classes=1)
    pth = tmp_path / "drill_ckpt.pth"
    # the reference release wraps weights as {"model": state_dict}
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               str(pth))

    ckpt_dir = tmp_path / "converted"
    drill_opts = TINY_OPTS + ["MODEL.FCOS.NUM_CLASSES", "1"]
    r = _run([
        "tools/convert_weights.py", "--pth", str(pth),
        "--config-file", "configs/centermask/zy_model_config.yaml",
        "--out", str(ckpt_dir),
    ] + drill_opts)
    assert r.returncode == 0, r.stderr[-3000:]
    # the drill checklist: conversion must be COMPLETE — any missing or
    # unused key means the checkpoint/config pairing is wrong
    assert "missing: 0" in r.stdout, r.stdout[-2000:]
    assert "unused torch keys" not in r.stdout, r.stdout[-2000:]
    assert (ckpt_dir).exists()

    out = tmp_path / "drill_out"
    r = _run([
        "tools/infer.py",
        "--config-file", "configs/centermask/zy_model_config.yaml",
        "--ann", str(tiny_coco / "ann.json"),
        "--image-root", str(tiny_coco / "images"),
        "--weights", str(ckpt_dir),
        "--output-dir", str(out),
        "TPU.FIXED_EDGE_SIZE", "320",
        "MODEL.FCOS.PRE_NMS_TOPK_TEST", "50",
        "INPUT.MIN_SIZE_TEST", "256", "INPUT.MAX_SIZE_TEST", "312",
    ] + drill_opts)
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = json.loads((out / "metrics.json").read_text())
    assert set(metrics) >= {"bbox", "segm"}
    # the AP table rows the drill compares against the reference README
    for task in ("bbox", "segm"):
        assert all(k in metrics[task] for k in ("AP", "AP50", "AP75"))
    assert "copypaste: AP,AP50,AP75,APs,APm,APl,AR1,AR10,AR100" in r.stdout


@pytest.fixture(scope="module")
def tiny_coco_kp(tmp_path_factory):
    """Two-image person-keypoints dataset (17 visible kps per ann)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("ds_kp")
    (root / "images").mkdir()
    rng = np.random.RandomState(3)
    images, anns = [], []
    for i in range(2):
        w, h = 300, 260
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            root / "images" / f"{i:012d}.jpg")
        images.append({"id": i, "file_name": f"{i:012d}.jpg",
                       "width": w, "height": h})
        x0, y0, bw, bh = 40 + 30 * i, 50, 120, 90
        kp = np.zeros((17, 3), np.float32)
        kp[:, 0] = x0 + rng.rand(17) * bw
        kp[:, 1] = y0 + rng.rand(17) * bh
        kp[:, 2] = 2
        anns.append({
            "id": i + 1, "image_id": i, "category_id": 1,
            "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0,
            "segmentation": [[x0, y0, x0 + bw, y0, x0 + bw, y0 + bh,
                              x0, y0 + bh]],
            "keypoints": kp.flatten().tolist(), "num_keypoints": 17})
    with open(root / "ann.json", "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    return root


@pytest.mark.slow
def test_train_cli_keypoint_end_to_end(tiny_coco_kp, tmp_path):
    """KEYPOINT_ON training from real COCO keypoint annotations through
    the CLI: gt_keypoints loading, MIN_KEYPOINTS_PER_IMAGE filter, and a
    finite loss_keypoint in metrics.jsonl."""
    out = tmp_path / "train_kp_out"
    r = _run([
        "tools/train_net.py",
        "--ann", str(tiny_coco_kp / "ann.json"),
        "--image-root", str(tiny_coco_kp / "images"),
        "--max-iter", "1", "--log-every", "1",
        "MODEL.MASK_ON", "False", "MODEL.MASKIOU_ON", "False",
        "MODEL.KEYPOINT_ON", "True",
        "MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS", "(32, 32)",
        "MODEL.FCOS.NUM_CLASSES", "1",
        "TPU.FIXED_EDGE_SIZE", "256",
        "MODEL.FCOS.PRE_NMS_TOPK_TRAIN", "50",
        "MODEL.FCOS.POST_NMS_TOPK_TRAIN", "20",
        "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "32",
        "TPU.MAX_FG_PROPOSALS", "8", "TPU.MAX_GT_INSTANCES", "8",
        "SOLVER.IMS_PER_BATCH", "2",
        "INPUT.MIN_SIZE_TRAIN", "(224,)", "INPUT.MAX_SIZE_TRAIN", "250",
        "SOLVER.CHECKPOINT_PERIOD", "5",
        "OUTPUT_DIR", str(out),
    ] + TINY_OPTS, n_devices=2)
    assert r.returncode == 0, r.stderr[-3000:]
    recs = [json.loads(l)
            for l in (out / "metrics.jsonl").read_text().strip().splitlines()]
    assert any("loss_keypoint" in rec and np.isfinite(rec["loss_keypoint"])
               for rec in recs), r.stdout[-2000:]


def test_bin_pipeline_cli(tiny_coco, tmp_path):
    """The offline device pipeline (SURVEY §3.3): preprocess_to_bin
    writes the reference byte contract (f32 NCHW 1x3x1344x1344 +
    manifest), postprocess_bins evaluates {stem}_{1..6}.bin output
    dumps. Synthesized outputs place one detection on each GT box in
    network coords, so bbox AP must be positive. No device involved."""
    import sys as _sys

    bins = tmp_path / "bins"
    r = _run(["tools/preprocess_to_bin.py",
              "--ann", str(tiny_coco / "ann.json"),
              "--image-root", str(tiny_coco / "images"),
              "--out", str(bins)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert (bins / "bin_info.txt").exists()
    raws = sorted(bins.glob("*.jpg.bin")) or sorted(bins.glob("0*.bin"))
    assert len([p for p in raws if "_" not in p.name[:12]]) >= 2
    first = next(p for p in bins.iterdir() if p.suffix == ".bin")
    assert first.stat().st_size == 4 * 3 * 1344 * 1344

    _sys.path.insert(0, REPO)
    from centermask2_tpu.data.bin_io import write_output_bins

    ann = json.loads((tiny_coco / "ann.json").read_text())
    for im in ann["images"]:
        gt_ann = next(a for a in ann["annotations"]
                      if a["image_id"] == im["id"])
        x, y, w, h = gt_ann["bbox"]
        scale = 800.0 / min(im["height"], im["width"])
        box = np.array([[x * scale, y * scale,
                         (x + w) * scale, (y + h) * scale]], np.float32)
        outs = [
            np.zeros((1, 2), np.float32),            # locations
            np.array([0.9], np.float32),             # mask_scores
            box,                                     # pred_boxes (network)
            np.array([0], np.int64),                 # pred_classes
            np.ones((1, 1, 28, 28), np.float32),     # pred_masks
            np.array([0.9], np.float32),             # scores
        ]
        stem = os.path.splitext(im["file_name"])[0]
        write_output_bins(outs, str(bins / stem))

    r = _run(["tools/postprocess_bins.py",
              "--ann", str(tiny_coco / "ann.json"),
              "--bin-dir", str(bins)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "== bbox ==" in r.stdout and "== segm ==" in r.stdout
    ap = float(r.stdout.split("== bbox ==")[1].splitlines()[1]
               .split("AP=")[1].split(",")[0])
    assert ap > 50.0, r.stdout[-1500:]


@pytest.mark.slow
def test_debug_tools_cli(tiny_coco, tmp_path):
    """The L7 debug/parity tools run end to end on a tiny config:
    parity_check (direct | exported | bins three-way ladder),
    check_layers dump+compare (self-compare => all-green cosine),
    measure (params/FLOPs/bytes)."""
    small = [
        "--config-file", "configs/centermask/zy_model_config.yaml",
        "TPU.FIXED_EDGE_SIZE", "128",
        "MODEL.FCOS.PRE_NMS_TOPK_TEST", "20",
        "MODEL.FCOS.POST_NMS_TOPK_TEST", "5", "TPU.NMS_CANDIDATES", "20",
        "MODEL.VOVNET.CONV_BODY", "V-19-slim-eSE",
        "TPU.COMPUTE_DTYPE", "float32",
    ]
    r = _run(["tools/parity_check.py"] + small)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "PASS" in r.stdout or "ok" in r.stdout.lower(), r.stdout[-800:]

    d1 = tmp_path / "dump1.npz"
    r = _run(["tools/check_layers.py", "dump", "--out", str(d1)] + small)
    assert r.returncode == 0, r.stderr[-3000:]
    assert d1.exists()
    r = _run(["tools/check_layers.py", "compare", str(d1), str(d1)])
    assert r.returncode == 0, r.stderr[-3000:]

    r = _run(["tools/measure.py", "--edge", "128"] + small)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "params" in r.stdout.lower() or "flop" in r.stdout.lower()


@pytest.mark.slow
def test_export_model_cli(tmp_path):
    """tools/export_model.py serializes the AOT artifact (plain f32 and
    the --serving-u8 --tight --tight-compute rect-canvas program)."""
    cfg = ["--config-file", "configs/centermask/zy_model_config.yaml"]
    opts = [
        "TPU.FIXED_EDGE_SIZE", "128",
        "MODEL.FCOS.PRE_NMS_TOPK_TEST", "20",
        "MODEL.FCOS.POST_NMS_TOPK_TEST", "5", "TPU.NMS_CANDIDATES", "20",
        "MODEL.VOVNET.CONV_BODY", "V-19-slim-eSE",
        "TPU.COMPUTE_DTYPE", "float32",
    ]
    out1 = tmp_path / "model.jaxir"
    r = _run(["tools/export_model.py", "--out", str(out1)] + cfg + opts)
    assert r.returncode == 0, r.stderr[-3000:]
    assert out1.exists() and out1.stat().st_size > 10000
    assert "exported" in r.stdout

    out2 = tmp_path / "serving_tc.jaxir"
    r = _run(["tools/export_model.py", "--out", str(out2),
              "--serving-u8", "--tight", "landscape", "--tight-compute"]
             + cfg + opts
             + ["INPUT.MIN_SIZE_TEST", "96", "TPU.S2D_STEM_INPUT", "True"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert out2.exists()
    assert "canvas (96, 128)" in r.stdout, r.stdout[-500:]


@pytest.mark.slow
def test_bench_cpu_smoke(tmp_path):
    """bench.py is the driver's BENCH artifact — a regression there loses
    the round's perf record. Run it end to end on CPU (lite body, tiny
    canvas, deadline forcing the secondary sections to self-skip) and
    assert the contract: ONE parseable JSON line, non-null value,
    vs_baseline present."""
    env = dict(os.environ)
    env.update(CM2_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               BENCH_BODY="V-19-slim-eSE", BENCH_EDGE="256",
               BENCH_ITERS="2", BENCH_BUDGET_S="1", BENCH_DEADLINE_S="60")
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [ln for ln in r.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1, r.stdout[-2000:]
    rec = json.loads(lines[0])
    assert rec["metric"] == "centermask2_v39_inference_latency_d2eval"
    assert rec["unit"] == "ms/image"
    assert rec.get("error") is None
    assert rec["value"] and rec["value"] > 0
    assert rec["vs_baseline"] and rec["vs_baseline"] > 0
    assert rec["canvas"] == [256, 256]
    # host preprocessing always reports (native s2d kernel)
    assert rec["host_preprocess_ms"] > 0


@pytest.mark.slow
def test_bench_cpu_serving_sections(tmp_path):
    """The pipelined-serving block (sustained_images_per_sec is part of
    the driver artifact contract) self-skips under the tight smoke
    deadline above — run bench.py once with enough deadline for it to
    execute on CPU so a regression inside the block (scoping, the u8
    tight pack, the link probe) is caught before the TPU run."""
    env = dict(os.environ)
    env.update(CM2_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               BENCH_BODY="V-19-slim-eSE", BENCH_EDGE="256",
               BENCH_ITERS="2", BENCH_BUDGET_S="1",
               BENCH_DEADLINE_S="600", BENCH_BATCH="2")
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [ln for ln in r.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1, r.stdout[-2000:]
    rec = json.loads(lines[0])
    assert rec.get("error") is None
    assert rec["sustained_images_per_sec"] > 0
    assert rec["host_pack_u8_ms"] > 0
    assert rec["transfer_mb_per_image"] > 0
    assert rec["projected_host_attached_images_per_sec"] > 0
