#!/usr/bin/env python
"""Evaluate device output .bin dumps (reference postprocess_bin_outputs.py).

Reads {image_id}_{1..6}.bin files (dtypes/shapes per the reference
contract), postprocesses, and computes COCO AP. Missing files are
collected and reported, not fatal (reference :48-52).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann", required=True)
    p.add_argument("--bin-dir", required=True)
    p.add_argument("--tasks", default="bbox,segm")
    args = p.parse_args()

    from centermask2_tpu.data import detector_postprocess, single_wrap_outputs
    from centermask2_tpu.data.bin_io import read_output_bins
    from centermask2_tpu.evaluation import COCOEvaluator, COCOGt

    with open(args.ann) as f:
        dataset = json.load(f)
    gt = COCOGt(dataset)
    cat_ids = sorted(gt.cats.keys())
    evaluator = COCOEvaluator(
        gt, tasks=tuple(args.tasks.split(",")),
        category_id_map={i: c for i, c in enumerate(cat_ids)})

    missing = []
    n_done = 0
    for img_id, img in gt.imgs.items():
        stem = os.path.splitext(img["file_name"])[0]
        prefix = os.path.join(args.bin_dir, stem)
        outs = read_output_bins(prefix)
        if outs is None:
            missing.append(stem)
            continue
        wrapped = single_wrap_outputs(outs)
        post = detector_postprocess(wrapped, img["height"], img["width"])
        evaluator.process(img_id, post)
        n_done += 1

    if missing:
        print(f"{len(missing)} images missing bins (skipped)")
    results = evaluator.evaluate()
    for task, metrics in results.items():
        print(f"== {task} ==")
        print(", ".join(f"{k}={v:.2f}" for k, v in metrics.items()))


if __name__ == "__main__":
    main()
