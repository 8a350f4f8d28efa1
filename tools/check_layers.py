#!/usr/bin/env python
"""Per-layer activation dump + comparison — the check_layers_outputs.py /
run_shell.py analog.

The reference debugs deployment drift by hooking a named torch module,
truncating the ONNX graph at the same tensor, and comparing device dumps
with cosine similarity + MAE (check_layers_outputs.py:34-97,
run_shell.py:15-34). The flax-native equivalent uses
``capture_intermediates``: every module's output is captured in one
forward pass, saved to an .npz, and two dumps can be diffed layer by
layer.

  # dump
  python tools/check_layers.py dump --out a.npz [--config-file ...] [opts]
  # compare two dumps
  python tools/check_layers.py compare a.npz b.npz [--threshold 0.99999]
"""

import argparse
import os
import sys

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


def flatten_intermediates(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_intermediates(v, f"{prefix}/{k}" if prefix else k))
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            out.update(flatten_intermediates(v, f"{prefix}[{i}]"))
    else:
        try:
            out[prefix] = np.asarray(tree)
        except Exception:
            pass
    return out


def cmd_dump(args, opts):
    import jax

    from centermask2_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax.numpy as jnp

    from centermask2_tpu.config import get_cfg
    from centermask2_tpu.data import preprocess_for_model
    from centermask2_tpu.models import CenterMask, build_centermask

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if opts:
        cfg.merge_from_list(opts)

    model = build_centermask(cfg)
    from centermask2_tpu.data.preprocess import input_transform_for
    to_input = input_transform_for(model)
    fixed = cfg.TPU.FIXED_EDGE_SIZE
    if args.image:
        x = jnp.asarray(to_input(preprocess_for_model(
            args.image, fixed, cfg.INPUT.MIN_SIZE_TEST,
            cfg.INPUT.MAX_SIZE_TEST)["input"]))
    else:
        rng = np.random.RandomState(args.seed)
        x = jnp.asarray(to_input(
            rng.randn(1, fixed, fixed, 3).astype(np.float32) * 30))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    filter_fn = None
    if args.filter:
        pat = args.filter

        def filter_fn(mdl, method_name):  # noqa: F811
            return pat in mdl.path[-1] if mdl.path else False

    _, state = model.apply(
        variables, x,
        capture_intermediates=filter_fn or True,
        mutable=["intermediates"])
    flat = flatten_intermediates(
        jax.tree.map(np.asarray, state["intermediates"]))
    # keep only numeric activations: an exotic leaf (None/object capture)
    # becomes an object array, which np.load refuses without pickle
    flat = {k: v for k, v in flat.items()
            if v.dtype != object and v.dtype.kind in "fiub"}
    np.savez_compressed(args.out, **flat)
    print(f"wrote {len(flat)} activations to {args.out}")
    for k in sorted(flat)[: args.list or 10]:
        print(f"  {k}: {flat[k].shape}")


def cmd_compare(args, _):
    a = np.load(args.a)
    b = np.load(args.b)
    keys = sorted(set(a.files) & set(b.files))
    missing = sorted(set(a.files) ^ set(b.files))
    worst = []
    for k in keys:
        if a[k].shape != b[k].shape:
            worst.append((0.0, np.inf, k))
            continue
        c = cos_sim(a[k], b[k])
        m = float(np.abs(a[k].astype(np.float64) - b[k].astype(np.float64)).mean())
        worst.append((c, m, k))
    worst.sort()
    print(f"{len(keys)} layers compared, {len(missing)} only in one dump")
    print(f"{'cos_sim':>10} {'mae':>12}  layer")
    for c, m, k in worst[: args.show]:
        flag = " <-- DRIFT" if c < args.threshold else ""
        print(f"{c:>10.6f} {m:>12.3e}  {k}{flag}")
    n_bad = sum(1 for c, _, _ in worst if c < args.threshold)
    print(f"{n_bad} layers below cosine threshold {args.threshold}")
    sys.exit(1 if n_bad else 0)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("--config-file", default=None)
    d.add_argument("--image", default=None)
    d.add_argument("--out", required=True)
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--filter", default=None, help="substring of module name")
    d.add_argument("--list", type=int, default=10)
    c = sub.add_parser("compare")
    c.add_argument("a")
    c.add_argument("b")
    c.add_argument("--threshold", type=float, default=1 - 1e-5)
    c.add_argument("--show", type=int, default=20)
    args, opts = p.parse_known_args()
    if args.cmd == "dump":
        cmd_dump(args, opts)
    else:
        cmd_compare(args, opts)


if __name__ == "__main__":
    main()
