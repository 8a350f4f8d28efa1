#!/usr/bin/env python
"""Training-step benchmark on the local accelerator.

Measures one full DP train step (forward + backward + SGD update) of the
flagship V-39-eSE config at the reference recipe's per-device batch
(16 imgs / 8 GPUs = 2; README.md:266-290). Chained-dependency timing as
in bench.py: n steps inside one jitted fori_loop with a traced bound.

env: BENCH_EDGE (default 896; 1344 = deployment canvas, slow compile),
     BENCH_BATCH (default 2), BENCH_ITERS (default 5), BENCH_REMAT (0/1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")

import numpy as np


def main():
    import jax

    from centermask2_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax.numpy as jnp

    from centermask2_tpu.models import CenterMask, GroundTruth
    from centermask2_tpu.train import make_optimizer
    from centermask2_tpu.train.trainer import create_train_state, make_train_step

    # BENCH_EDGE: square edge, or "HxW" for a rect canvas (the
    # TPU.TRAIN_TIGHT_PAD d2-geometry step, e.g. 800x1344)
    edge_spec = os.environ.get("BENCH_EDGE", "896")
    if "x" in edge_spec:
        eh, ew = (int(v) for v in edge_spec.split("x"))
    else:
        eh = ew = int(edge_spec)
    edge = max(eh, ew)
    B = int(os.environ.get("BENCH_BATCH", "2"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    s2d = os.environ.get("BENCH_S2D", "0") == "1"

    model = CenterMask(conv_body="V-39-eSE", mask_on=True, maskiou_on=True,
                       remat_backbone=remat, s2d_input=s2d)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, eh, ew, 3).astype(np.float32) * 30)
    if s2d:
        # training with TPU.S2D_STEM_INPUT: the host input pipeline
        # (train_net.py to_input) feeds the s2d layout; stem params stay
        # natural-layout, the kernel transforms are differentiable
        from centermask2_tpu.data.preprocess import stem_space_to_depth
        images = jnp.asarray(stem_space_to_depth(np.asarray(images)))
    G = 20
    boxes = np.zeros((B, G, 4), np.float32)
    boxes[..., 2:] = rng.uniform(40, min(eh, ew) / 2, (B, G, 2))
    boxes[..., :2] = rng.uniform(0, min(eh, ew) / 2, (B, G, 2))
    boxes[..., 2:] += boxes[..., :2]
    gt = GroundTruth(
        boxes=jnp.asarray(boxes),
        classes=jnp.asarray(rng.randint(0, 80, (B, G)), jnp.int32),
        valid=jnp.ones((B, G), bool),
        mask_patches=jnp.asarray(
            (rng.rand(B, G, 28, 28) > 0.5).astype(np.float32)))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1])
    opt = make_optimizer(0.01, (60000, 80000),
                         params_example=variables["params"])
    state = create_train_state(variables, opt)
    step = make_train_step(model, opt)

    def chained(state, n):
        def body(i, s):
            s2, _ = step(s, images, gt, jax.random.fold_in(
                jax.random.PRNGKey(0), i))
            return s2
        return jax.lax.fori_loop(0, n, body, state)

    fn = jax.jit(chained)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(state, 1))
    print(f"compile+warmup: {time.perf_counter() - t0:.1f} s", file=sys.stderr)

    # min of each arm SEPARATELY before differencing: min over paired
    # differences is biased low when interference hits the n=1 baseline
    # (see bench.py). Sample across a time budget (BENCH_REPS /
    # BENCH_BUDGET_S): train wall time is window-dependent by ~13% on
    # the shared tunnel (measured 50.6 vs 57.2 ms for the SAME cached
    # executable 40 min apart, round 5), so a single 3-rep burst can
    # pin the whole number to one window's quality. Report the spread
    # ((median-min)/min over the n=iters samples) as the qualifier.
    reps = max(3, int(os.environ.get("BENCH_REPS", "8")))
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "120"))
    best_one = float("inf")
    many = []
    t_start = time.perf_counter()
    for rep in range(reps):
        if rep >= 3 and time.perf_counter() - t_start > budget_s:
            break
        t0 = time.perf_counter()
        jax.block_until_ready(fn(state, 1))
        best_one = min(best_one, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(state, iters))
        many.append(time.perf_counter() - t0)
    best_many = min(many)
    spread = float(np.median(many) - best_many) / best_many
    best = (best_many - best_one) / (iters - 1)

    ms = best * 1000.0
    out = {
        "metric": "centermask2_v39_train_step",
        "value": round(ms, 2),
        "unit": "ms/step",
        "edge": edge_spec,
        "batch": B,
        "remat": remat,
        "s2d": s2d,
        "imgs_per_sec": round(B / best, 2),
        "window_spread": round(spread, 3),
    }

    # MFU of the whole train step (fwd + bwd + SGD): exact HLO flops of
    # the single-step program / measured step time / chip bf16 peak
    try:
        from centermask2_tpu.utils.measures import chip_peak_flops

        cost = jax.jit(step).lower(
            state, images, gt, jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
        peak = chip_peak_flops()
        if flops > 0:
            out["step_tflops"] = round(flops / 1e12, 3)
            out["achieved_tflops"] = round(flops / best / 1e12, 1)
            if peak > 0:
                out["mfu"] = round(flops / best / peak, 3)
    except Exception as e:  # pragma: no cover
        print(f"[warn] cost analysis failed: {e!r}", file=sys.stderr)

    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
