"""Shared dataset-evaluation loop.

The engine behind tools/infer.py's single-image path and the trainer's
periodic evaluation (TEST.EVAL_PERIOD — detectron2's EvalHook analog):
preprocess -> model -> host postprocess -> mask-score-aware COCO
evaluator. Returns the metrics dict {task: {metric: value}} including
the class-agnostic box_proposals AR block.

The loop is pipelined for single-core hosts feeding one chip: a
prefetch thread runs decode/resize/s2d ahead of the device, and the
device step is dispatched asynchronously (image i+1 enters the queue
before the host blocks on image i's outputs), so host preprocessing and
postprocessing overlap device compute instead of serializing with it.
"""

from __future__ import annotations

import json
import time
from collections import deque
from typing import Callable, Optional, Tuple


def evaluate_dataset(
    model,
    variables,
    *,
    ann: str,
    image_root: str,
    fixed_size: int,
    min_size: int,
    max_size: int,
    tasks: Tuple[str, ...] = ("bbox", "segm"),
    limit: int = 0,
    fn: Optional[Callable] = None,
    ds=None,
    gt=None,
    progress_every: int = 50,
    pipeline_depth: int = 2,
    kpt_oks_sigmas=None,
    tight: Optional[bool] = None,
    tight_compute: bool = False,
    distributed: bool = False,
):
    """Evaluate ``model`` over a COCO-format dataset one image at a time.

    ``fn(variables, images, valid_hw)`` overrides the jitted forward
    (defaults to ``jax.jit(model.apply)``) — pass a hoisted jitted fn
    when calling periodically, or the fresh lambda here defeats jit's
    in-memory trace cache. ``ds`` (CocoDataset) / ``gt`` (COCOGt) skip
    re-parsing the annotation json. Returns
    (results, avg_ms_per_image, evaluator) — avg_ms is the SUSTAINED
    wall-clock rate of the pipelined loop (host preprocess + transfer +
    device + postprocess, overlapped), and the evaluator exposes the raw
    COCO-json ``predictions``.

    With an s2d-input model the device is fed the RAW uint8 s2d pack
    (1/4 the transfer bytes; normalization on device), bit-identical to
    the f32 path — over the quantized TIGHT canvas (~1.67x fewer bytes
    again, s2d_serving_canvas) when ``tight`` is on. ``tight`` defaults
    to s2d when the loop builds its own forward; when YOU pass ``fn``
    and want tight packs, the fn must apply the model with
    canvas_hw=(fixed_size, fixed_size) and you must pass tight=True.

    ``tight_compute`` (s2d only) goes further: the device program RUNS at
    the quantized tight canvas instead of padding the pack back to the
    deployment square — ~1.7-1.9x less device compute for typical COCO
    shapes (the fully-convolutional model is shape-polymorphic; at most
    4 canvases => at most 4 compiled programs). This is the
    detectron2-eval-equivalent workload: d2 pads each image only to /32,
    so the reference's published AP/latency came from tight shapes, and
    the fixed square is purely the ONNX deploy contract. Numerics note
    (mirrors the reference's own deploy-vs-eval divergence, in the same
    direction): canvas size reaches the math through the eSE gate's
    global pool, through receptive-field bleed past the image edge that
    a smaller canvas truncates earlier (tests/test_meta.py::
    test_rect_canvas_feature_crop_parity_fcn_backbone pins the band),
    and through the padded-canvas size doubling as the image_sizes
    default used by ROI area-ratio level assignment.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from centermask2_tpu.data import (detector_postprocess,
                                      preprocess_for_model,
                                      single_wrap_outputs)
    from centermask2_tpu.data.coco import CocoDataset
    from centermask2_tpu.data.prefetch import prefetch
    from centermask2_tpu.evaluation import COCOEvaluator, COCOGt

    s2d = bool(getattr(model, "s2d_input", False))
    tight_compute = bool(tight_compute) and s2d
    if fn is None:
        if tight is None:
            tight = s2d
        if tight_compute:
            # no canvas_hw: the program runs at the pack's own canvas;
            # jit compiles one program per distinct canvas (<= 4, the
            # s2d_serving_canvas quantization)
            fn = jax.jit(lambda v, im, hw: model.apply(v, im, None, hw))
        else:
            fn = jax.jit(lambda v, im, hw: model.apply(
                v, im, None, hw, canvas_hw=(fixed_size, fixed_size)))
    tight = (bool(tight) or tight_compute) and s2d
    # host-numpy weights would re-upload per jit call (once per image) —
    # place them on device once
    variables = jax.device_put(variables)

    if ds is None:
        ds = CocoDataset(ann, image_root, filter_empty=False)
    if gt is None:
        with open(ann) as f:
            gt = COCOGt(json.load(f))
    evaluator = COCOEvaluator(gt, tasks=tasks,
                              category_id_map=ds.contiguous_to_cat,
                              kpt_oks_sigmas=kpt_oks_sigmas)

    ids = ds.ids[:limit] if limit else ds.ids
    multiproc = distributed and jax.process_count() > 1
    if multiproc:
        # each process evaluates a strided slice of the dataset
        # (detectron2 InferenceSampler analog); predictions merge below
        from centermask2_tpu.parallel import process_subset
        ids = list(process_subset(ids))

    def produce():
        for img_id in ids:
            yield img_id, preprocess_for_model(
                ds.image_path(img_id), fixed_size, min_size, max_size,
                s2d=s2d, u8=s2d, tight=tight)

    n_done = 0

    done_ts = []

    def drain(pending):
        nonlocal n_done
        img_id, pre, out = pending.popleft()
        out = jax.tree.map(np.asarray, out)  # blocks on this image only
        done_ts.append(time.perf_counter())
        out_b = jax.tree.map(lambda x: x[0], out)
        valid = out_b.valid
        tup = (out_b.locations[valid], out_b.mask_scores[valid],
               out_b.pred_boxes[valid], out_b.pred_classes[valid],
               out_b.pred_masks[valid], out_b.scores[valid],
               out_b.pred_keypoints[valid]
               if out_b.pred_keypoints is not None else None)
        wrapped = single_wrap_outputs(tup)
        h, w = pre["original_hw"]
        post = detector_postprocess(wrapped, h, w, short=pre["short"],
                                    max_size=pre["max_size"])
        evaluator.process(img_id, post)
        n_done += 1
        if progress_every and n_done % progress_every == 0:
            rate = (time.perf_counter() - t_start) / n_done * 1000
            print(f"[eval {n_done}/{len(ids)}] {rate:.1f} ms/img sustained")

    pending: deque = deque()
    t_start = time.perf_counter()
    for img_id, pre in prefetch(produce(), depth=max(2, pipeline_depth)):
        # async dispatch: the device starts on this image while the host
        # postprocesses an older one and the prefetch thread decodes a
        # newer one
        out = fn(variables, jnp.asarray(pre["input"]),
                 jnp.asarray(pre["valid_hw"]))
        pending.append((img_id, pre, out))
        if len(pending) > pipeline_depth:
            drain(pending)
    while pending:
        drain(pending)
    wall = time.perf_counter() - t_start

    if multiproc:
        # merge per-process predictions before scoring (the reference's
        # cross-rank comm.gather, coco_evaluation.py:154-160 — here a
        # multihost_utils process_allgather of the serialized records);
        # scoring runs on the main process only, like rank 0 there.
        from centermask2_tpu.parallel import (all_gather_objects,
                                              is_main_process)
        gathered = all_gather_objects(
            (evaluator.predictions, evaluator.proposals))
        evaluator.predictions = [p for preds, _ in gathered for p in preds]
        evaluator.proposals = {k: v for _, props in gathered
                               for k, v in props.items()}
        if not is_main_process():
            return {}, wall / max(len(ids), 1) * 1000.0, evaluator

    results = evaluator.evaluate()
    results["box_proposals"] = evaluator.evaluate_proposals()
    avg_ms = wall / max(len(ids), 1) * 1000.0
    if len(done_ts) >= 4:
        # steady-state rate: median inter-completion interval. avg_ms
        # amortizes one-time jit compiles (up to ~4 canvases in
        # tight-compute mode, minutes each on a cold remote cache) over
        # however many images were run — misleading for short runs; the
        # median interval is compile-free once warm.
        gaps = np.diff(np.asarray(done_ts))
        steady = float(np.median(gaps)) * 1000.0
        if steady < avg_ms * 0.9:
            print(f"[eval] avg {avg_ms:.1f} ms/img includes one-time "
                  f"compiles; steady-state {steady:.1f} ms/img "
                  "(median inter-completion interval)")
        evaluator.steady_ms_per_image = steady
    return results, avg_ms, evaluator
