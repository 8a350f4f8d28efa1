#!/usr/bin/env python
"""Capture and summarize a device profile of the inference pipeline.

The TPU-native replacement for the reference's hook/ONNX tracing toolchain
(SURVEY.md §5 tracing): captures a jax.profiler trace, then prints the
top device ops with HLO metadata (module path + source line) so hot spots
map straight back to framework code.

  python tools/profile_model.py [--config-file ...] [--runs 3] [--top 25] [opts]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def summarize(trace_dir: str, runs: int, top: int, hlo_text: str = ""):
    f = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(f) as fh:
        data = json.load(fh)
    # restrict to the device's "XLA Ops" thread: the trace also carries
    # "Steps" and "XLA Modules" tracks whose parent spans would double-
    # count every op (a train-step trace shows 5x the true time without
    # this filter)
    op_tids = {e["tid"] for e in data["traceEvents"]
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("pid") == 3 and e["args"]["name"] == "XLA Ops"}
    events = [e for e in data["traceEvents"]
              if e.get("ph") == "X" and e.get("pid") == 3 and "dur" in e
              and e.get("tid") in op_tids
              and not e["name"].startswith("jit_")]
    total = sum(e["dur"] for e in events)
    print(f"device op time: {total / runs / 1000:.2f} ms/run")

    # map HLO op name -> source metadata
    meta = {}
    if hlo_text:
        for line in hlo_text.splitlines():
            line = line.strip()
            if "op_name=" in line and "= " in line.split("op_name=")[0]:
                name = line.lstrip("%").split(" ", 1)[0].rstrip(" =")
                tag = line.split('op_name="', 1)[-1].split('"')[0]
                # keep the FULL path for section matching (a 90-char cut
                # truncated 'features/backbone' and misattributed the
                # whole backbone backward); the display slices for print
                meta[name] = tag.split("jit(<lambda>)/")[-1]

    by = defaultdict(float)
    for e in events:
        by[e["name"]] += e["dur"]
    print(f"{'ms/run':>9}  {'cum%':>5}  op (module path)")
    cum = 0.0
    for n, d in sorted(by.items(), key=lambda kv: -kv[1])[:top]:
        cum += d
        src = meta.get(n, "")
        print(f"{d / runs / 1000:9.3f}  {cum / total * 100:5.1f}  "
              f"{n[:40]} {src[:95]}")

    # pipeline-section rollup (module-path prefix buckets): the "which
    # stage regressed" view bench_stages gives, but from ONE trace with
    # per-op attribution instead of chained-window differencing. The
    # bucket table lives in centermask2_tpu/utils/trace_sections.py and
    # is shared with tools/roofline_bound.py so both tools classify a
    # trace identically.
    from centermask2_tpu.utils.trace_sections import section_of
    rollup = defaultdict(float)
    for n, d in by.items():
        rollup[section_of(meta.get(n, ""))] += d
    print("\nsection rollup:")
    for name, d in sorted(rollup.items(), key=lambda kv: -kv[1]):
        print(f"{d / runs / 1000:9.3f}  {d / total * 100:5.1f}%  {name}")

    # the "(unattributed)" bucket hides whatever has no module path
    # (optimizer update, infeed/outfeed copies, scheduler-inserted
    # fusions) — name its top ops so it can't silently grow
    unattr = sorted(((n, d) for n, d in by.items()
                     if not meta.get(n, "")), key=lambda kv: -kv[1])
    if unattr:
        print("\ntop unattributed ops:")
        for n, d in unattr[:12]:
            print(f"{d / runs / 1000:9.3f}  {n[:70]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--train", action="store_true",
                   help="profile one full DP train step (fwd+bwd+SGD, "
                        "synthetic GT as in tools/bench_train.py) instead "
                        "of the inference graph")
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args()

    import jax

    from centermask2_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax.numpy as jnp

    from centermask2_tpu.config import get_cfg
    from centermask2_tpu.models import build_centermask

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    model = build_centermask(cfg)
    if not cfg.MODEL.MASK_ON:
        # the raw config default is MASK_ON=False (reference defaults.py);
        # profiling it silently drops the whole roi/mask branch (~22 ms
        # of a 66 ms train step) — say so loudly
        print("[warn] MODEL.MASK_ON is False: profiling a MASKLESS graph "
              "(pass MODEL.MASK_ON True MODEL.MASKIOU_ON True for the "
              "flagship pipeline)", file=sys.stderr)
    fixed = cfg.TPU.FIXED_EDGE_SIZE
    rng = np.random.RandomState(0)
    x_img = rng.randn(args.batch, fixed, fixed, 3).astype(np.float32) * 30
    from centermask2_tpu.data.preprocess import input_transform_for
    x = jnp.asarray(input_transform_for(model)(x_img))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # serve in bf16 like bench.py so the profile reflects the benched graph
    if os.environ.get("CM2_PROFILE_F32_PARAMS") != "1":
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params)
    if args.train:
        # full DP train step on synthetic GT (same setup as bench_train)
        from centermask2_tpu.models import GroundTruth
        from centermask2_tpu.train import make_optimizer
        from centermask2_tpu.train.trainer import (create_train_state,
                                                   make_train_step)
        G = 20
        boxes = np.zeros((args.batch, G, 4), np.float32)
        boxes[..., 2:] = rng.uniform(40, fixed / 2, (args.batch, G, 2))
        boxes[..., :2] = rng.uniform(0, fixed / 2, (args.batch, G, 2))
        boxes[..., 2:] += boxes[..., :2]
        gt = GroundTruth(
            boxes=jnp.asarray(boxes),
            classes=jnp.asarray(rng.randint(0, 80, (args.batch, G)),
                                jnp.int32),
            valid=jnp.ones((args.batch, G), bool),
            mask_patches=jnp.asarray(
                (rng.rand(args.batch, G, 28, 28) > 0.5).astype(np.float32)))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
        opt = make_optimizer(0.01, (60000, 80000),
                             params_example=variables["params"])
        state = create_train_state(variables, opt)
        step = make_train_step(model, opt)
        key = jax.random.PRNGKey(1)
        fn = lambda s: step(s, x, gt, key)  # noqa: E731
        state, _ = fn(state)
        jax.block_until_ready(state)
        hlo_text = ""
        try:
            hlo_text = jax.jit(step).lower(
                state, x, gt, key).compile().as_text()
        except Exception:
            pass
        trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="cm2_trace_")
        with jax.profiler.trace(trace_dir):
            for _ in range(args.runs):
                state, _ = fn(state)
            jax.block_until_ready(state)
        print(f"trace: {trace_dir}")
        summarize(trace_dir, args.runs, args.top, hlo_text)
        return

    fn = jax.jit(lambda p, im: model.apply(p, im))
    out = fn(params, x)
    jax.block_until_ready(out)

    hlo_text = ""
    try:
        hlo_text = jax.jit(lambda p, im: model.apply(p, im)).lower(
            params, x).compile().as_text()
    except Exception:
        pass

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="cm2_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.runs):
            out = fn(params, x)
        jax.block_until_ready(out)
    print(f"trace: {trace_dir}")
    summarize(trace_dir, args.runs, args.top, hlo_text)


if __name__ == "__main__":
    main()
