#!/usr/bin/env python
"""Inference + evaluation harness — the tester.py analog.

Runs the TPU model over a COCO-format dataset, applies the reference's
host postprocessing (rescale + paste masks), and evaluates bbox/segm AP
with the built-in mask-score-aware evaluator
(reference flow: tester.py:78-134).

Usage:
  python tools/infer.py --config-file configs/centermask/zy_model_config.yaml \
      --ann instances_val2017.json --image-root val2017 \
      [--weights model.pth|orbax_dir] [--limit N] [--output-dir out]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default=None)
    p.add_argument("--ann", required=True, help="COCO annotations json")
    p.add_argument("--image-root", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each batch over all local devices "
                        "(batch-size must be a multiple of the device count)")
    p.add_argument("--output-dir", default="output/infer")
    p.add_argument("--tasks", default="bbox,segm")
    p.add_argument("--tight-compute", action="store_true",
                   help="run the device program at the quantized tight "
                        "canvas (s2d models; <=4 compiled shapes) instead "
                        "of padding back to the deployment square — the "
                        "detectron2-eval-equivalent workload, ~1.7-1.9x "
                        "less device compute for typical COCO shapes")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from centermask2_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax.numpy as jnp

    from centermask2_tpu.config import get_cfg
    from centermask2_tpu.data import preprocess_for_model, single_wrap_outputs, \
        detector_postprocess
    from centermask2_tpu.data.coco import CocoDataset
    from centermask2_tpu.evaluation import COCOEvaluator, COCOGt
    from centermask2_tpu.models import build_centermask
    from centermask2_tpu.checkpoint.convert_torch import (
        convert_checkpoint, load_torch_checkpoint, merge_params)

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    model = build_centermask(cfg)
    fixed = cfg.TPU.FIXED_EDGE_SIZE
    x0 = np.zeros((1, fixed, fixed, 3), np.float32)
    from centermask2_tpu.data.preprocess import input_transform_for
    to_input = input_transform_for(model)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.asarray(to_input(x0)))

    if args.weights:
        if args.weights.endswith(".pth"):
            sd = load_torch_checkpoint(args.weights)
            converted, _ = convert_checkpoint(
                sd, conv_body=cfg.MODEL.VOVNET.CONV_BODY,
                backbone=("resnet" if "resnet" in cfg.MODEL.BACKBONE.NAME
                          else "mobilenet"
                          if ("mobilenet" in cfg.MODEL.BACKBONE.NAME
                              or cfg.MODEL.MOBILENET) else "vovnet"),
                resnet_depth=cfg.MODEL.RESNETS.DEPTH)
            params, missing = merge_params(
                jax.tree.map(np.asarray, variables["params"]), converted)
            if missing:
                print(f"[warn] {len(missing)} params not found in checkpoint")
            variables = {"params": jax.tree.map(jnp.asarray, params)}
        else:
            from centermask2_tpu.checkpoint.orbax_io import load_checkpoint
            variables = load_checkpoint(args.weights, target=variables)

    # eval-loop forward contract: fn(variables, images, valid_hw) —
    # valid_hw drives on-device normalization of raw uint8 s2d inputs
    # (unused, and DCE'd by XLA, for f32 inputs); canvas_hw pads TIGHT
    # s2d packs back to the deployment square on device (no-op for
    # full-size or non-s2d inputs)
    if args.tight_compute and not model.s2d_input:
        raise SystemExit("--tight-compute requires an s2d-input model "
                         "(TPU.S2D_STEM_INPUT)")
    if args.tight_compute:
        fn = None  # evaluate_dataset builds the per-canvas jitted forward
        # (data-parallel: make_dp_inference is canvas-agnostic — batches
        # grouped by serving canvas below run at that canvas directly)
    else:
        fn = jax.jit(lambda v, im, hw: model.apply(
            v, im, None, hw, canvas_hw=(fixed, fixed)))
    if args.data_parallel and args.batch_size <= 1:
        raise SystemExit(
            "--data-parallel requires --batch-size > 1 (a multiple of the "
            "device count); with batch 1 there is nothing to shard")
    if args.data_parallel and args.batch_size > 1:
        # SPMD serving: batch sharded over the data mesh, each device
        # running the optimized single-image program on its shard
        from centermask2_tpu.parallel import (
            default_image_sizes, make_dp_inference, make_mesh, replicate,
            shard_batch)

        mesh = make_mesh()
        ndev = len(mesh.devices.ravel())
        if args.batch_size % ndev:
            raise SystemExit(
                f"--batch-size {args.batch_size} not divisible by "
                f"{ndev} devices")
        variables = replicate(variables, mesh)
        dp_infer = make_dp_inference(model, mesh)

        def fn(v, im, hw=None):  # noqa: F811 - dispatch wrapper
            sizes = default_image_sizes(model, im)
            if hw is None:
                return dp_infer(v, *shard_batch((im, sizes), mesh))
            return dp_infer(v, *shard_batch((im, sizes, hw), mesh))
    elif args.batch_size > 1:
        # Single-chip "batched" serving is host-pipelined async dispatch
        # of the B=1 program: XLA's B>1 conv layouts measurably regress
        # (see CenterMask.inference_batched — kept for API parity), so
        # the fastest batched mode on one chip is the single-image
        # executable with batch_size images in flight.
        print(f"[note] batch-size {args.batch_size} on one chip runs the "
              "pipelined single-image program (see inference_batched)")

    ds = CocoDataset(args.ann, args.image_root, filter_empty=False)
    ids = ds.ids[: args.limit] if args.limit else ds.ids
    with open(args.ann) as f:
        gt = COCOGt(json.load(f))

    if not args.data_parallel:
        from centermask2_tpu.evaluation.loop import evaluate_dataset

        # multi-process eval: with CM2_COORDINATOR/CM2_NUM_PROCESSES/
        # CM2_PROCESS_ID set, each process scores a strided dataset slice
        # and predictions merge via process_allgather before rank-0
        # scoring (reference coco_evaluation.py:154-160)
        from centermask2_tpu.parallel import init_distributed, is_main_process
        init_distributed()
        multiproc = jax.process_count() > 1

        results, avg_ms, evaluator = evaluate_dataset(
            model, variables, ann=args.ann, image_root=args.image_root,
            fixed_size=fixed, min_size=cfg.INPUT.MIN_SIZE_TEST,
            max_size=cfg.INPUT.MAX_SIZE_TEST,
            tasks=tuple(args.tasks.split(",")), limit=args.limit, fn=fn,
            ds=ds, gt=gt, pipeline_depth=max(2, args.batch_size),
            kpt_oks_sigmas=cfg.TEST.KEYPOINT_OKS_SIGMAS,
            tight=model.s2d_input, tight_compute=args.tight_compute,
            distributed=multiproc)
        if multiproc and not is_main_process():
            return  # rank 0 owns scoring + artifacts
        finish(args, results, evaluator, avg_ms)
        return

    evaluator = COCOEvaluator(
        gt, tasks=tuple(args.tasks.split(",")),
        category_id_map=ds.contiguous_to_cat,
        kpt_oks_sigmas=cfg.TEST.KEYPOINT_OKS_SIGMAS)
    total_time = 0.0
    n_done = 0

    def handle_image(img_id, out_b, pre):
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

    # shape-bucketed batched inference (BASELINE.json config); with
    # --tight-compute the batches are grouped by quantized tight canvas
    # instead of square bucket and run at that rect canvas directly
    from centermask2_tpu.data.bucketing import (batches_from_groups,
                                                group_by_bucket,
                                                group_by_serving_canvas)

    sizes = [(ds.imgs[i]["height"], ds.imgs[i]["width"]) for i in ids]
    if args.tight_compute:
        groups = group_by_serving_canvas(ids, sizes, fixed,
                                         cfg.INPUT.MIN_SIZE_TEST,
                                         cfg.INPUT.MAX_SIZE_TEST)
    else:
        groups = group_by_bucket(ids, sizes, cfg.TPU.SIZE_BUCKETS,
                                 cfg.INPUT.MIN_SIZE_TEST,
                                 cfg.INPUT.MAX_SIZE_TEST)
    for bucket, chunk, n_real in batches_from_groups(groups, args.batch_size):
        # s2d models ship the RAW uint8 s2d pack at the bucket canvas
        # (4x fewer host->device bytes; on-device normalization);
        # tight-compute packs at the group's serving canvas instead
        pres = [preprocess_for_model(ds.image_path(ids[i]),
                                     fixed if args.tight_compute else bucket,
                                     cfg.INPUT.MIN_SIZE_TEST,
                                     cfg.INPUT.MAX_SIZE_TEST,
                                     s2d=model.s2d_input, u8=model.s2d_input,
                                     tight=args.tight_compute)
                for i in chunk]
        batch = jnp.asarray(np.concatenate([p["input"] for p in pres]))
        hw = (jnp.asarray(np.concatenate([p["valid_hw"] for p in pres]))
              if model.s2d_input else None)
        t0 = time.perf_counter()
        out = fn(variables, batch, hw)
        out = jax.tree.map(np.asarray, out)
        total_time += time.perf_counter() - t0
        for bi in range(n_real):
            handle_image(ids[chunk[bi]],
                         jax.tree.map(lambda x: x[bi], out), pres[bi])
            n_done += 1
        if n_done % 50 < args.batch_size:
            print(f"[{n_done}] {total_time / max(n_done, 1) * 1000:.1f} ms/img")

    results = evaluator.evaluate()
    results["box_proposals"] = evaluator.evaluate_proposals()
    finish(args, results, evaluator,
           total_time / max(len(ids), 1) * 1000.0)


def finish(args, results, evaluator, avg_ms):
    """Persist predictions + metrics and print the summary tables."""
    from centermask2_tpu.evaluation.coco_eval import print_csv_format

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir,
                           "coco_instances_results.json"), "w") as f:
        json.dump(evaluator.predictions, f)

    for task, metrics in results.items():
        summary = {k: v for k, v in metrics.items() if not k.startswith("AP-")}
        print(f"== {task} ==")
        print(", ".join(f"{k}={v:.2f}" for k, v in summary.items()))
        # per-category AP table (reference coco_evaluation.py:345-356)
        items = sorted((k[3:], v) for k, v in metrics.items()
                       if k.startswith("AP-"))
        for i in range(0, len(items), 3):
            print("  " + " | ".join(
                f"{n:>18s}: {v:6.2f}" for n, v in items[i:i + 3]))
    print_csv_format(results)
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"avg inference: {avg_ms:.1f} ms/img")


if __name__ == "__main__":
    main()
