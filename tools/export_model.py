#!/usr/bin/env python
"""AOT export CLI — the convert_model_into_onnx.py analog.

Lowers the fixed-shape inference function (weights baked in) and
serializes it with jax.export. The artifact replays without the model
definition (tools/parity_check.py validates the roundtrip).

  python tools/export_model.py --config-file configs/centermask/zy_model_config.yaml \
      [--weights model.pth|orbax_dir] --out centermask2.jaxir [opts...]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default=None)
    p.add_argument("--weights", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--serving-u8", action="store_true",
                   help="export the raw-uint8 s2d serving program "
                        "callable(images_u8, valid_hw) — requires "
                        "TPU.S2D_STEM_INPUT True")
    p.add_argument("--tight", choices=["landscape", "portrait"], default=None,
                   help="with --serving-u8: export for the TIGHT quantized "
                        "canvas of this orientation (s2d_serving_canvas) "
                        "instead of the full square")
    p.add_argument("--tight-compute", action="store_true",
                   help="with --tight: the exported program RUNS at the "
                        "tight canvas (no on-device pad-back to the "
                        "square) — the d2-eval-equivalent workload, "
                        "~1.7-1.9x less device compute (see "
                        "tools/infer.py --tight-compute)")
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args()

    import jax

    from centermask2_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax.numpy as jnp

    from centermask2_tpu.config import get_cfg
    from centermask2_tpu.export import compile_inference, export_serialized
    from centermask2_tpu.models import build_centermask

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    model = build_centermask(cfg)
    from centermask2_tpu.data.preprocess import input_transform_for
    to_input = input_transform_for(model)
    fixed = cfg.TPU.FIXED_EDGE_SIZE
    shape = tuple(to_input(
        np.zeros((args.batch, fixed, fixed, 3), np.float32)).shape)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(to_input(np.zeros((1, fixed, fixed, 3), np.float32))))

    if args.weights:
        if args.weights.endswith(".pth"):
            from centermask2_tpu.checkpoint.convert_torch import (
                convert_checkpoint, load_torch_checkpoint, merge_params)

            sd = load_torch_checkpoint(args.weights)
            conv, _ = convert_checkpoint(
                sd, conv_body=cfg.MODEL.VOVNET.CONV_BODY,
                backbone=("resnet" if "resnet" in cfg.MODEL.BACKBONE.NAME
                          else "mobilenet"
                          if ("mobilenet" in cfg.MODEL.BACKBONE.NAME
                              or cfg.MODEL.MOBILENET) else "vovnet"),
                resnet_depth=cfg.MODEL.RESNETS.DEPTH)
            params, missing = merge_params(
                jax.tree.map(np.asarray, variables["params"]), conv)
            if missing:
                print(f"[warn] {len(missing)} params missing from checkpoint")
            variables = {"params": jax.tree.map(jnp.asarray, params)}
        else:
            from centermask2_tpu.checkpoint.orbax_io import load_checkpoint

            variables = load_checkpoint(args.weights, target=variables)

    if args.serving_u8:
        if not model.s2d_input:
            raise SystemExit("--serving-u8 requires TPU.S2D_STEM_INPUT True")
        from centermask2_tpu.data.preprocess import s2d_serving_canvas

        short = cfg.INPUT.MIN_SIZE_TEST
        if args.tight == "landscape":
            ch, cw = s2d_serving_canvas(short, fixed, fixed, short)
        elif args.tight == "portrait":
            cw, ch = s2d_serving_canvas(short, fixed, fixed, short)
        else:
            ch = cw = fixed
        if args.tight_compute and not args.tight:
            raise SystemExit("--tight-compute requires --tight "
                             "(an orientation to pick the canvas)")
        shape = (args.batch, ch // 4 + 1, cw // 4 + 1, 48)
        canvas = None if args.tight_compute else (fixed, fixed)
        path = export_serialized(model, variables, shape, args.out,
                                 input_dtype=jnp.uint8,
                                 canvas_hw=canvas)
        print(f"exported {path} ({os.path.getsize(path) / 1e6:.1f} MB), "
              f"uint8 s2d input {shape} + valid_hw, canvas "
              f"{(ch, cw) if args.tight_compute else fixed}")
        return

    path = export_serialized(model, variables, shape, args.out)
    size_mb = os.path.getsize(path) / 1e6
    print(f"exported {path} ({size_mb:.1f} MB), input {shape}")

    _, cost = compile_inference(model, variables, shape)
    if cost:
        print(f"flops: {cost.get('flops', 0) / 1e9:.1f} GFLOP")


if __name__ == "__main__":
    main()
