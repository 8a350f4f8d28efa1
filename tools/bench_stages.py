#!/usr/bin/env python
"""Per-stage latency breakdown of the inference pipeline on the local
accelerator, with a per-stage roofline table (incremental HLO flops /
incremental ms / % of chip peak) so "the conv core is at its tiling
limit" is a checkable claim. Chained-dependency timing (see bench.py)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import numpy as np


def make_sampler(fn, x, iters=10):
    """Compile fn(x, n) (n traced: one compile serves every n) and
    return a zero-arg PAIRED sampler: (n=1, n=iters) back to back in the
    same measurement window, returning the per-iteration increment."""
    import jax

    jax.block_until_ready(fn(x, 1))  # compile once

    def sample():
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x, 1))
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x, iters))
        t_many = time.perf_counter() - t0
        return t_one, t_many

    return sample, iters


def timed_interleaved(named_fns, x, repeats=6):
    """Per-graph latency for several graphs, sampled INTERLEAVED
    round-robin so every graph sees every measurement window.

    The axon tunnel time-shares and drifts 1-2 ms between windows;
    timing each stage in its own window corrupts the stage INCREMENTS
    (adjacent cumulative stages land in different windows — observed
    decode increments of 0.5 vs 2.2 ms across runs).

    Estimator: min(t_many) and min(t_one) are taken SEPARATELY over
    repeats before differencing. min over paired differences is biased
    low — a repeat whose n=1 baseline catches interference while the
    n=iters run does not yields an underestimate, and min selects
    exactly those samples (observed: "full pipeline" 7.1 ms < its own
    decode prefix 8.7 ms). Each min alone converges to the uncontended
    time, so their difference is the honest per-iteration increment.
    """
    samplers = [(name,) + make_sampler(fn, x) for name, fn in named_fns]
    ones = {name: float("inf") for name, _, _ in samplers}
    manys = {name: float("inf") for name, _, _ in samplers}
    for _ in range(repeats):
        for name, s, _ in samplers:
            t_one, t_many = s()
            ones[name] = min(ones[name], t_one)
            manys[name] = min(manys[name], t_many)
    return {name: max((manys[name] - ones[name]) / (iters - 1), 0.0)
            for name, _, iters in samplers}


def main():
    from centermask2_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp

    from centermask2_tpu.data.preprocess import stem_space_to_depth
    from centermask2_tpu.models import CenterMask
    from centermask2_tpu.models.fcos import compute_locations, decode_batch

    # BENCH_EDGE: square edge, or "HxW" for a rect (tight-compute) canvas
    edge_spec = os.environ.get("BENCH_EDGE", "1344")
    if "x" in edge_spec:
        eh, ew = (int(v) for v in edge_spec.split("x"))
    else:
        eh = ew = int(edge_spec)
    # match bench.py's serving config: s2d stem input + bf16 params
    # (override with BENCH_S2D=0 / BENCH_BF16=0 for the fp32 NHWC path)
    s2d = os.environ.get("BENCH_S2D", "1") == "1"
    bf16 = os.environ.get("BENCH_BF16", "1") == "1"
    model = CenterMask(conv_body="V-39-eSE", mask_on=True, maskiou_on=True,
                       post_nms_topk_test=50, nms_candidates=1000,
                       s2d_input=s2d)
    rng = np.random.RandomState(0)
    x_img = rng.randn(1, eh, ew, 3).astype(np.float32) * 30
    x = jnp.asarray(stem_space_to_depth(x_img) if s2d else x_img)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    if bf16:
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params)

    # stage 1: backbone + FPN
    def feats_fn(im):
        return model.apply(params, im, method=CenterMask.features)

    weights = jnp.linspace(1.0, 1.01, 64)

    def chain_feats(im, n):
        # consume EVERY level: reducing only p7 lets XLA DCE the p3/p4
        # laterals and output convs (top-down means p7 needs only p5)
        def body(i, acc):
            f = feats_fn(im * weights[i])
            tot = sum(v.astype(jnp.float32).sum() for v in f.values())
            return acc + tot[None]
        return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.float32))

    def stage_flops(fn):
        try:
            cost = jax.jit(fn).lower(x).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            return float(cost.get("flops", 0.0)) if cost else 0.0
        except Exception:
            return 0.0

    chains = []  # (name, chained_fn, stage_fn) — timed interleaved below

    chains.append(("backbone+fpn", jax.jit(chain_feats), feats_fn))

    # stage 2: + FCOS head (raw)
    def head_fn(im):
        feats = model.apply(params, im, method=CenterMask.features)
        locations, logits, reg, ctr = model.apply(
            params, feats, method=CenterMask._fcos_raw)
        return logits, reg, ctr

    def chain_head(im, n):
        # consume all towers at all levels (see chain_feats note)
        def body(i, acc):
            lgs, regs, ctrs = head_fn(im * weights[i])
            tot = sum(v.astype(jnp.float32).sum()
                      for vs in (lgs, regs, ctrs) for v in vs)
            return acc + tot[None]
        return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.float32))

    chains.append(("fcos head", jax.jit(chain_head), head_fn))

    # stage 3: + decode (topk+nms)
    def dec_fn(im):
        feats = model.apply(params, im, method=CenterMask.features)
        locations, logits, reg, ctr = model.apply(
            params, feats, method=CenterMask._fcos_raw)
        proposals = decode_batch(
            locations, logits, reg, ctr, model.fpn_strides,
            pre_nms_thresh=0.05, pre_nms_topk=1000, nms_thresh=0.6,
            post_nms_topk=50, nms_candidates=1000)
        return (proposals.scores + proposals.pred_boxes.sum(axis=2)
                + proposals.pred_classes.astype(jnp.float32))

    def chain_dec(im, n):
        def body(i, acc):
            s = dec_fn(im * weights[i])
            return acc + s.sum()[None]
        return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.float32))

    chains.append(("decode", jax.jit(chain_dec), dec_fn))

    # stage 4: full
    def full_fn(im):
        out = model.apply(params, im)
        return (out.scores + out.mask_scores.astype(jnp.float32)
                + out.pred_masks.astype(jnp.float32).sum(axis=(2, 3, 4))
                + out.pred_boxes.sum(axis=2))

    def chain_full(im, n):
        def body(i, acc):
            s = full_fn(im * weights[i])
            return acc + s.sum()[None]
        return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.float32))

    chains.append(("roi+mask+maskiou", jax.jit(chain_full), full_fn))

    # optional: standalone NMS chain (BENCH_NMS=1) to attribute the
    # decode increment between the top-k stack and nms_select. Not part
    # of the cumulative roofline table.
    extra = []
    if os.environ.get("BENCH_NMS", "0") == "1":
        from centermask2_tpu.ops import nms_select

        nb = int(os.environ.get("BENCH_NMS_N", "1000"))
        rb = rng.rand(nb, 4).astype(np.float32) * 600
        base_boxes = jnp.asarray(
            np.concatenate([rb[:, :2], rb[:, :2] + 16 + rb[:, 2:] * 20], 1))
        base_scores = jnp.asarray(rng.rand(nb).astype(np.float32))
        base_cls = jnp.asarray(rng.randint(0, 80, nb).astype(np.int32))
        vmask = jnp.ones((nb,), bool)

        def chain_nms(im, n):
            del im

            def body(i, acc):
                idx, kv = nms_select(base_boxes * weights[i], base_scores,
                                     base_cls, vmask, 0.6, 50)
                return (acc + idx.sum().astype(jnp.float32)[None]
                        + kv.sum().astype(jnp.float32)[None])

            return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.float32))

        extra.append(("nms_select", jax.jit(chain_nms)))

    labels = {"backbone+fpn": "backbone+fpn", "fcos head": "+fcos head",
              "decode": "+decode(topk+nms)", "roi+mask+maskiou":
              "full pipeline"}
    times = timed_interleaved([(n, f) for n, f, _ in chains] + extra, x)
    stages = []
    for name, _, sfn in chains:
        t = times[name]
        print(f"{labels[name]}: {t * 1000:.2f} ms")
        stages.append((name, t, stage_flops(sfn)))
    for name, _ in extra:
        print(f"[extra] {name}: {times[name] * 1000:.2f} ms")

    # roofline table: per-stage INCREMENTS over the previous cumulative
    # stage, against the chip's bf16 peak
    from centermask2_tpu.utils.measures import chip_peak_flops

    peak = chip_peak_flops()
    print()
    print(f"{'stage':>18s} {'ms':>7s} {'GFLOP':>8s} {'TFLOP/s':>8s} "
          f"{'%peak':>6s}")
    prev_t = prev_f = 0.0
    for name, ct, cf in stages:
        dt_s, df = ct - prev_t, cf - prev_f
        prev_t, prev_f = ct, cf
        if dt_s <= 0:
            continue
        tflops = df / dt_s / 1e12
        pct = 100.0 * tflops * 1e12 / peak if peak else float("nan")
        print(f"{name:>18s} {dt_s * 1e3:7.2f} {df / 1e9:8.2f} "
              f"{tflops:8.1f} {pct:6.1f}")
    if peak:
        print(f"(chip peak {peak / 1e12:.0f} TFLOP/s bf16; "
              "incremental flops from XLA cost analysis)")


if __name__ == "__main__":
    main()
