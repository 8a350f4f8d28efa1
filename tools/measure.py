#!/usr/bin/env python
"""Model statistics: params, FLOPs, bytes (the measures.py analog CLI).

  python tools/measure.py --config-file configs/centermask/zy_model_config.yaml \
      [--edge 1344] [opts...]
"""

import argparse
import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default=None)
    p.add_argument("--edge", type=int, default=0)
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args()

    import jax

    from centermask2_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax.numpy as jnp

    from centermask2_tpu.config import get_cfg
    from centermask2_tpu.models import CenterMask, build_centermask
    from centermask2_tpu.utils.measures import (count_params, measure_model,
                                                param_bytes)

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    edge = args.edge or cfg.TPU.FIXED_EDGE_SIZE

    model = build_centermask(cfg)
    from centermask2_tpu.data.preprocess import input_transform_for
    to_input = input_transform_for(model)
    shape = tuple(to_input(np.zeros((1, edge, edge, 3), np.float32)).shape)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros(shape)))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

    n = count_params(params["params"])
    print(f"config: {cfg.MODEL.VOVNET.CONV_BODY} @ {edge}x{edge}")
    print(f"params: {n / 1e6:.2f} M ({param_bytes(params['params']) / 1e6:.1f} MB fp32)")

    def feats(v, im):
        return model.apply(v, im, method=CenterMask.features)

    def full(v, im):
        return model.apply(v, im)

    for name, fn in [("backbone+fpn", feats), ("full inference", full)]:
        st = measure_model(fn, params, jnp.zeros(shape))
        flops = st.get("flops", 0)
        line = (f"{name}: {flops / 1e9:.1f} GFLOP, "
                f"{st.get('bytes_accessed', 0) / 1e9:.2f} GB accessed (pre-fusion)")
        if st.get("peak_temp_bytes"):
            line += f", {st['peak_temp_bytes'] / 1e6:.0f} MB peak HBM temps"
        print(line)


if __name__ == "__main__":
    main()
