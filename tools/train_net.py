#!/usr/bin/env python
"""Training driver — the train_net analog the reference README invokes
(README.md:287-290; the fork itself ships no trainer, SURVEY.md §0).

Data-parallel over all local devices: batch sharded on a 1-D mesh, FCOS
loss normalizers psum'd across replicas (the reference's
dist.all_reduce), SGD momentum with warmup-multistep LR, Orbax
checkpoints every SOLVER.CHECKPOINT_PERIOD.

  python tools/train_net.py --config-file configs/centermask/zy_model_config.yaml \
      --ann instances_train2017.json --image-root train2017 [--max-iter N]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default=None)
    p.add_argument("--ann", required=True)
    p.add_argument("--image-root", required=True)
    p.add_argument("--val-ann", default=None,
                   help="COCO val annotations for periodic evaluation "
                        "(TEST.EVAL_PERIOD iters; detectron2 EvalHook analog)")
    p.add_argument("--val-image-root", default=None)
    p.add_argument("--val-limit", type=int, default=0)
    p.add_argument("--max-iter", type=int, default=0)
    p.add_argument("--resume", default=None)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    import jax

    from centermask2_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax.numpy as jnp

    from centermask2_tpu.config import get_cfg
    from centermask2_tpu.data.coco import CocoDataset, train_batches
    from centermask2_tpu.models import GroundTruth, build_centermask
    from centermask2_tpu.parallel import (global_mesh, init_distributed,
                                          is_main_process, make_mesh,
                                          replicate, replicate_from_host,
                                          shard_batch, shard_host_batch)
    from centermask2_tpu.train import (create_train_state, make_optimizer,
                                       make_train_step)
    from centermask2_tpu.checkpoint.orbax_io import (latest_checkpoint,
                                                     load_checkpoint,
                                                     save_checkpoint)
    from centermask2_tpu.utils.events import EventStorage

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    max_iter = args.max_iter or cfg.SOLVER.MAX_ITER

    # multi-host: join the cluster when CM2_COORDINATOR/CM2_NUM_PROCESSES/
    # CM2_PROCESS_ID are set (a no-op otherwise); the SAME shard_map train
    # step then runs over the global mesh spanning every process's chips
    # — the reference's process-spanning DDP launch (its README.md:290),
    # with XLA collectives over ICI/DCN instead of NCCL.
    init_distributed()
    multiproc = jax.process_count() > 1
    main_proc = is_main_process()

    model = build_centermask(cfg)
    mesh = global_mesh() if multiproc else make_mesh()
    n_dev = len(jax.devices())
    batch_size = cfg.SOLVER.IMS_PER_BATCH  # GLOBAL batch (reference: 16)
    assert batch_size % n_dev == 0, (batch_size, n_dev)
    local_batch = batch_size // jax.process_count()

    fixed = cfg.TPU.FIXED_EDGE_SIZE
    from centermask2_tpu.data.preprocess import input_transform_for
    to_input = input_transform_for(model)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(to_input(np.zeros((1, fixed, fixed, 3), np.float32))))
    if (cfg.SOLVER.CLIP_GRADIENTS.ENABLED
            and cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "norm"
            and float(cfg.SOLVER.CLIP_GRADIENTS.NORM_TYPE) != 2.0):
        raise ValueError("only NORM_TYPE 2.0 (global L2) is supported")
    optimizer = make_optimizer(
        cfg.SOLVER.BASE_LR, tuple(cfg.SOLVER.STEPS),
        momentum=cfg.SOLVER.MOMENTUM, weight_decay=cfg.SOLVER.WEIGHT_DECAY,
        weight_decay_norm=cfg.SOLVER.WEIGHT_DECAY_NORM,
        nesterov=cfg.SOLVER.NESTEROV,
        gamma=cfg.SOLVER.GAMMA, warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
        warmup_iters=cfg.SOLVER.WARMUP_ITERS,
        warmup_method=cfg.SOLVER.WARMUP_METHOD,
        clip_value=(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE
                    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED else 0.0),
        clip_type=cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT)
    state = create_train_state(params, optimizer)

    out_dir = cfg.OUTPUT_DIR
    os.makedirs(out_dir, exist_ok=True)
    if args.resume:
        path = args.resume if os.path.basename(args.resume).startswith("step_") \
            else latest_checkpoint(args.resume)
        if path:
            state = load_checkpoint(path, target=state)
            print(f"resumed from {path} at step {int(state.step)}")

    state = (replicate_from_host(jax.device_get(state), mesh)
             if multiproc else replicate(state, mesh))
    train_step = make_train_step(model, optimizer, mesh=mesh)

    ds = CocoDataset(args.ann, args.image_root,
                     filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS)
    if cfg.MODEL.KEYPOINT_ON:
        from centermask2_tpu.data.coco import filter_images_with_few_keypoints
        dropped = filter_images_with_few_keypoints(
            ds, cfg.MODEL.ROI_KEYPOINT_HEAD.MIN_KEYPOINTS_PER_IMAGE)
        if dropped:
            print(f"dropped {dropped} images with < "
                  f"{cfg.MODEL.ROI_KEYPOINT_HEAD.MIN_KEYPOINTS_PER_IMAGE} "
                  "visible keypoints")
    if main_proc:
        print(f"{len(ds)} training images, {n_dev} devices "
              f"({jax.process_count()} processes), batch {batch_size}")
    from centermask2_tpu.data.prefetch import prefetch
    # each process draws its own LOCAL batch stream: a per-process seed
    # offset decorrelates the sampling (detectron2 per-rank sampler)
    batches = prefetch(train_batches(
        ds, local_batch,
        min_sizes=tuple(cfg.INPUT.MIN_SIZE_TRAIN),
        max_size=cfg.INPUT.MAX_SIZE_TRAIN,
        pad_to=(fixed, fixed),
        max_gt=cfg.TPU.MAX_GT_INSTANCES,
        seed=max(cfg.SEED, 0) + jax.process_index(),
        random_flip=cfg.INPUT.RANDOM_FLIP,
        sampling=cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING,
        workers=cfg.DATALOADER.NUM_WORKERS,
        with_keypoints=cfg.MODEL.KEYPOINT_ON,
        tight_pad=cfg.TPU.TRAIN_TIGHT_PAD), depth=2)

    # periodic evaluation resources, hoisted: one jitted forward, one
    # annotation parse for the whole run (TEST.EVAL_PERIOD)
    eval_period = cfg.TEST.EVAL_PERIOD if args.val_ann else 0
    if eval_period > 0:
        from centermask2_tpu.data.coco import CocoDataset as _CocoDataset
        from centermask2_tpu.evaluation import COCOGt
        from centermask2_tpu.evaluation.loop import evaluate_dataset

        eval_fn = jax.jit(lambda v, im, hw: model.apply(
            v, im, None, hw, canvas_hw=(fixed, fixed)))
        eval_ds = _CocoDataset(args.val_ann,
                               args.val_image_root or args.image_root,
                               filter_empty=False)
        import json as _json
        with open(args.val_ann) as f:
            eval_gt = COCOGt(_json.load(f))
        eval_tasks = ("bbox", "segm") if cfg.MODEL.MASK_ON else ("bbox",)

    start = int(jax.device_get(state.step))
    storage = EventStorage(
        os.path.join(out_dir, "metrics.jsonl") if main_proc else None,
        start_iter=start)
    rng = jax.random.PRNGKey(start)
    t0 = time.perf_counter()
    for it, batch in enumerate(batches, start=start):
        if it >= max_iter:
            break
        gt = GroundTruth(
            boxes=jnp.asarray(batch["gt_boxes"]),
            classes=jnp.asarray(batch["gt_classes"]),
            valid=jnp.asarray(batch["gt_valid"]),
            mask_patches=jnp.asarray(batch["gt_mask_patches"]),
            keypoints=(jnp.asarray(batch["gt_keypoints"])
                       if "gt_keypoints" in batch else None),
            image_sizes=jnp.asarray(batch["image_size"], jnp.float32))
        images = jnp.asarray(to_input(batch["image"]))
        if multiproc:
            images, gt = shard_host_batch(
                jax.tree.map(np.asarray, (images, gt)), mesh)
        else:
            images, gt = shard_batch((images, gt), mesh)
        rng, step_rng = jax.random.split(rng)
        if multiproc and it == start:
            # first step: AOT-compile locally (feeds the persistent
            # compilation cache), then rendezvous — cross-process compile
            # skew otherwise exceeds the Gloo context-init timeout at the
            # first gradient psum
            from centermask2_tpu.parallel import barrier
            train_step.lower(state, images, gt, step_rng).compile()
            barrier("cm2_first_step", 3_600_000)
        state, metrics = train_step(state, images, gt, step_rng)

        if (it + 1) % args.log_every == 0:
            m = jax.tree.map(float, jax.device_get(metrics))
            dt = (time.perf_counter() - t0) / args.log_every
            t0 = time.perf_counter()
            if main_proc:
                storage.put_scalars(**m)
                storage.put_scalar("s_per_iter", dt)
                print(f"iter {it + 1}/{max_iter} "
                      + " ".join(f"{k}={v:.4f}"
                                 for k, v in sorted(m.items()))
                      + f" ({dt:.2f} s/it)")
        if (it + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0 or (it + 1) == max_iter:
            # state is replicated: every process holds the full values,
            # so only the main process writes (reference rank-0 saver)
            if main_proc:
                path = save_checkpoint(os.path.join(out_dir, "checkpoints"),
                                       jax.device_get(state), it + 1)
                print(f"saved {path}")
        if (eval_period > 0
                and ((it + 1) % eval_period == 0 or (it + 1) == max_iter)):
            eval_vars = dict(state.params)  # device-resident, replicated
            if state.model_state:  # BN running stats for eval forward
                eval_vars.update(state.model_state)
            if multiproc:
                # the eval forward is a per-process single-device jit:
                # hand it host values, not global-mesh arrays; each
                # process scores its dataset slice and the predictions
                # merge inside evaluate_dataset (distributed=True)
                eval_vars = jax.device_get(eval_vars)
            results, _, _ = evaluate_dataset(
                model, eval_vars,
                ann=args.val_ann,
                image_root=args.val_image_root or args.image_root,
                fixed_size=fixed, min_size=cfg.INPUT.MIN_SIZE_TEST,
                max_size=cfg.INPUT.MAX_SIZE_TEST, limit=args.val_limit,
                fn=eval_fn, ds=eval_ds, gt=eval_gt, tasks=eval_tasks,
                progress_every=0, tight=model.s2d_input,
                distributed=multiproc)
            if main_proc:
                flat = {f"{task}/{k}": v for task, m in results.items()
                        for k, v in m.items() if not k.startswith("AP-")}
                storage.put_scalars(**flat)
                print(f"eval @{it + 1}: " + " ".join(
                    f"{k}={v:.2f}" for k, v in flat.items()
                    if k in ("bbox/AP", "segm/AP", "bbox/AP50", "segm/AP50")))
        storage.step()


if __name__ == "__main__":
    main()
