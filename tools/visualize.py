#!/usr/bin/env python
"""Draw predictions on an image (reference visualizer.py analog).

Renders boxes, class labels, scores, and mask overlays with cv2, at both
the padded network size and the original size (the reference renders the
same pair for pre/post-mismatch spotting, visualizer.py:41-106).
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

COCO_CLASSES = None  # populated from --ann if given


# COCO person skeleton (1-based keypoint pairs, the d2/COCO rendering)
COCO_SKELETON = ((16, 14), (14, 12), (17, 15), (15, 13), (12, 13), (6, 12),
                 (7, 13), (6, 7), (6, 8), (7, 9), (8, 10), (9, 11), (2, 3),
                 (1, 2), (1, 3), (2, 4), (3, 5), (4, 6), (5, 7))


def draw(image_bgr, boxes, classes, scores, masks=None, class_names=None,
         keypoints=None, kp_thresh=0.05):
    import cv2

    rng = np.random.RandomState(0)
    colors = rng.randint(60, 255, (80, 3))
    out = image_bgr.copy()
    for i in range(len(boxes)):
        x0, y0, x1, y1 = [int(round(v)) for v in boxes[i]]
        c = tuple(int(v) for v in colors[int(classes[i]) % 80])
        cv2.rectangle(out, (x0, y0), (x1, y1), c, 2)
        name = (class_names[int(classes[i])]
                if class_names else str(int(classes[i])))
        cv2.putText(out, f"{name} {scores[i]:.2f}", (x0, max(y0 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, c, 1)
        if masks is not None:
            m = masks[i].astype(bool)
            overlay = out[m].astype(np.float32) * 0.5 + np.array(c) * 0.5
            out[m] = overlay.astype(np.uint8)
        if keypoints is not None:
            kp = np.asarray(keypoints[i])  # (K, 3) x, y, prob
            vis = kp[:, 2] >= kp_thresh
            for k in range(len(kp)):
                if vis[k]:
                    cv2.circle(out, (int(round(kp[k, 0])),
                                     int(round(kp[k, 1]))), 3, c, -1)
            if len(kp) == 17:  # COCO person skeleton
                for a, b in COCO_SKELETON:
                    if vis[a - 1] and vis[b - 1]:
                        cv2.line(out,
                                 (int(round(kp[a - 1, 0])),
                                  int(round(kp[a - 1, 1]))),
                                 (int(round(kp[b - 1, 0])),
                                  int(round(kp[b - 1, 1]))), c, 1)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--config-file", default=None)
    p.add_argument("--weights", default=None)
    p.add_argument("--output", default="visualized_outputs.jpg")
    p.add_argument("--score-thresh", type=float, default=0.3)
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args()

    import cv2
    import jax

    from centermask2_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax.numpy as jnp

    from centermask2_tpu.config import get_cfg
    from centermask2_tpu.data import (detector_postprocess,
                                      preprocess_for_model,
                                      single_wrap_outputs)
    from centermask2_tpu.models import build_centermask

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    model = build_centermask(cfg)
    fixed = cfg.TPU.FIXED_EDGE_SIZE
    pre = preprocess_for_model(args.image, fixed, cfg.INPUT.MIN_SIZE_TEST,
                               cfg.INPUT.MAX_SIZE_TEST)
    from centermask2_tpu.data.preprocess import input_transform_for
    to_input = input_transform_for(model)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.asarray(to_input(pre["input"])))
    if args.weights:
        from centermask2_tpu.checkpoint.convert_torch import (
            convert_checkpoint, load_torch_checkpoint, merge_params)

        sd = load_torch_checkpoint(args.weights)
        conv, _ = convert_checkpoint(sd, conv_body=cfg.MODEL.VOVNET.CONV_BODY)
        params, _ = merge_params(
            jax.tree.map(np.asarray, variables["params"]), conv)
        variables = {"params": jax.tree.map(jnp.asarray, params)}

    out = jax.tree.map(np.asarray, jax.jit(model.apply)(
        variables, jnp.asarray(to_input(pre["input"]))))
    valid = out.valid[0] & (out.scores[0] >= args.score_thresh)
    tup = (out.locations[0][valid], out.mask_scores[0][valid],
           out.pred_boxes[0][valid], out.pred_classes[0][valid],
           out.pred_masks[0][valid], out.scores[0][valid],
           out.pred_keypoints[0][valid]
           if out.pred_keypoints is not None else None)
    wrapped = single_wrap_outputs(tup)
    h, w = pre["original_hw"]
    post = detector_postprocess(wrapped, h, w)

    orig = cv2.imread(args.image)
    vis = draw(orig, post["pred_boxes"], post["pred_classes"], post["scores"],
               post["pred_masks"], keypoints=post.get("pred_keypoints"))
    cv2.imwrite(args.output, vis)
    print(f"wrote {args.output} with {len(post['pred_boxes'])} instances")


if __name__ == "__main__":
    main()
