#!/usr/bin/env python
"""Convert a reference torch .pth checkpoint into an Orbax params dir.

The one-shot converter step 2 of the build plan (SURVEY.md §7):
  python tools/convert_weights.py --pth centermask2-V-39-eSE-FPN-ms-3x.pth \
      --config-file configs/centermask/zy_model_config.yaml --out ckpt/v39
Reports key coverage like the reference's check_keys (deploy_utils.py:31-43).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--config-file", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    import jax

    from centermask2_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax.numpy as jnp

    from centermask2_tpu.config import get_cfg
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
    from centermask2_tpu.data.preprocess import input_transform_for
    x0 = input_transform_for(model)(np.zeros((1, fixed, fixed, 3), np.float32))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(x0)))
    init = jax.tree.map(lambda s: np.zeros(s.shape, np.float32),
                        variables["params"])

    sd = load_torch_checkpoint(args.pth)
    converted, report = convert_checkpoint(
        sd, conv_body=cfg.MODEL.VOVNET.CONV_BODY,
        backbone=("resnet" if "resnet" in cfg.MODEL.BACKBONE.NAME
                  else "mobilenet"
                  if ("mobilenet" in cfg.MODEL.BACKBONE.NAME
                      or cfg.MODEL.MOBILENET) else "vovnet"),
        resnet_depth=cfg.MODEL.RESNETS.DEPTH)
    params, missing = merge_params(init, converted)

    n_total = len(jax.tree.leaves(init))
    print(f"{n_total} model params, {len(sd)} torch keys")
    print(f"filled: {n_total - len(missing)}, missing: {len(missing)}")
    if missing:
        print("missing params:", missing[:30])
    unused = [k for k in report["unused_torch_keys"]
              if not k.endswith("num_batches_tracked")
              and "pixel_" not in k and "anchor" not in k]
    if unused:
        print(f"unused torch keys ({len(unused)}):", unused[:30])

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), {"params": params})
    ckptr.wait_until_finished()
    print(f"saved to {args.out}")


if __name__ == "__main__":
    main()
