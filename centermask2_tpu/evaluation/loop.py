"""Shared dataset-evaluation loop.

The engine behind tools/infer.py's single-image path and the trainer's
periodic evaluation (TEST.EVAL_PERIOD — detectron2's EvalHook analog):
preprocess -> model -> host postprocess -> mask-score-aware COCO
evaluator. Returns the metrics dict {task: {metric: value}} including
the class-agnostic box_proposals AR block.
"""

from __future__ import annotations

import json
import time
from typing import Callable, Optional, Tuple

import numpy as np


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
):
    """Evaluate ``model`` over a COCO-format dataset one image at a time.

    ``fn(variables, images)`` overrides the jitted forward (defaults to
    ``jax.jit(model.apply)``) — pass a hoisted jitted fn when calling
    periodically, or the fresh lambda here defeats jit's in-memory trace
    cache. ``ds`` (CocoDataset) / ``gt`` (COCOGt) skip re-parsing the
    annotation json. Returns (results, avg_ms_per_image, evaluator) —
    the evaluator exposes the raw COCO-json ``predictions``.
    """
    import jax
    import jax.numpy as jnp

    from centermask2_tpu.data import (detector_postprocess,
                                      preprocess_for_model,
                                      single_wrap_outputs)
    from centermask2_tpu.data.coco import CocoDataset
    from centermask2_tpu.data.preprocess import input_transform_for
    from centermask2_tpu.evaluation import COCOEvaluator, COCOGt

    if fn is None:
        fn = jax.jit(lambda v, im: model.apply(v, im))
    # host-numpy weights would re-upload per jit call (once per image) —
    # place them on device once
    variables = jax.device_put(variables)
    to_input = input_transform_for(model)

    if ds is None:
        ds = CocoDataset(ann, image_root, filter_empty=False)
    if gt is None:
        with open(ann) as f:
            gt = COCOGt(json.load(f))
    evaluator = COCOEvaluator(gt, tasks=tasks,
                              category_id_map=ds.contiguous_to_cat)

    ids = ds.ids[:limit] if limit else ds.ids
    total_time = 0.0
    for n, img_id in enumerate(ids):
        pre = preprocess_for_model(ds.image_path(img_id), fixed_size,
                                   min_size, max_size)
        t0 = time.perf_counter()
        out = fn(variables, jnp.asarray(to_input(pre["input"])))
        out = jax.tree.map(np.asarray, out)
        total_time += time.perf_counter() - t0
        out_b = jax.tree.map(lambda x: x[0], out)
        valid = out_b.valid
        tup = (out_b.locations[valid], out_b.mask_scores[valid],
               out_b.pred_boxes[valid], out_b.pred_classes[valid],
               out_b.pred_masks[valid], out_b.scores[valid])
        wrapped = single_wrap_outputs(tup)
        h, w = pre["original_hw"]
        post = detector_postprocess(wrapped, h, w, short=pre["short"],
                                    max_size=pre["max_size"])
        evaluator.process(img_id, post)
        if progress_every and (n + 1) % progress_every == 0:
            print(f"[eval {n + 1}/{len(ids)}] "
                  f"{total_time / (n + 1) * 1000:.1f} ms/img")

    results = evaluator.evaluate()
    results["box_proposals"] = evaluator.evaluate_proposals()
    avg_ms = total_time / max(len(ids), 1) * 1000.0
    return results, avg_ms, evaluator
