#!/usr/bin/env python
"""Three-way implementation parity ladder — the tester.py analog.

The reference proves its deployment chain by running the same input
through three stacks (origin torch | modified torch | onnx) and comparing
(tester.py:78-134). The TPU-native ladder is:

  direct   — model.apply under jit,
  exported — the serialized AOT artifact (jax.export roundtrip),
  bins     — the 6-tensor outputs written to .bin files and read back
             with the reference dtype/shape contract.

All three must agree; cosine similarity + MAE per output tensor
(the run_shell.py:15-34 comparison math).
"""

import argparse
import os
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cos_sim(a, b):
    a = a.reshape(-1).astype(np.float64)
    b = b.reshape(-1).astype(np.float64)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 and nb == 0:
        return 1.0
    if na == 0 or nb == 0:
        return 0.0
    return float(a @ b / (na * nb))


def mae(a, b):
    return float(np.abs(a.astype(np.float64) - b.astype(np.float64)).mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default=None)
    p.add_argument("--image", default=None, help="optional real image")
    p.add_argument("--weights", default=None)
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args()

    import jax

    from centermask2_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax.numpy as jnp

    from centermask2_tpu.config import get_cfg
    from centermask2_tpu.data import bin_io, preprocess_for_model
    from centermask2_tpu.export import export_serialized, load_serialized
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
    if args.image:
        x = jnp.asarray(to_input(preprocess_for_model(
            args.image, fixed, cfg.INPUT.MIN_SIZE_TEST,
            cfg.INPUT.MAX_SIZE_TEST)["input"]))
    else:
        rng = np.random.RandomState(0)
        x = jnp.asarray(to_input(
            rng.randn(1, fixed, fixed, 3).astype(np.float32) * 30))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    # 1) direct
    direct = jax.tree.map(np.asarray, jax.jit(model.apply)(variables, x))

    # 2) exported artifact roundtrip
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model.jaxir")
        export_serialized(model, variables, tuple(x.shape), path)
        loaded = load_serialized(path)
        exported = [np.asarray(t) for t in jax.tree.leaves(loaded(x))]

    # 3) bin roundtrip of the 6-tensor contract
    names = ["locations", "mask_scores", "pred_boxes", "pred_classes",
             "pred_masks", "scores"]
    six = [np.asarray(getattr(direct, n))[0] for n in names]
    six[3] = six[3].astype(np.int64)
    with tempfile.TemporaryDirectory() as d:
        prefix = os.path.join(d, "img")
        bin_io.write_output_bins(six, prefix)
        bins = bin_io.read_output_bins(prefix)

    print(f"{'output':<14}{'cos(direct,export)':>20}{'mae':>12}"
          f"{'cos(direct,bins)':>20}{'mae':>12}")
    ok = True
    for i, n in enumerate(["locations", "mask_scores", "pred_boxes",
                           "pred_classes", "pred_masks", "scores", "valid"]):
        a = np.asarray(getattr(direct, n)).astype(np.float64)
        b = exported[i].astype(np.float64)
        c1, m1 = cos_sim(a, b), mae(a, b)
        if n in names:
            j = names.index(n)
            c2, m2 = cos_sim(six[j], bins[j].reshape(six[j].shape)), \
                mae(six[j], bins[j].reshape(six[j].shape))
        else:
            c2, m2 = 1.0, 0.0
        print(f"{n:<14}{c1:>20.6f}{m1:>12.2e}{c2:>20.6f}{m2:>12.2e}")
        ok &= c1 > 1 - 1e-5 and c2 > 1 - 1e-5  # run_shell.py:22 criterion
    print("PARITY OK" if ok else "PARITY FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
