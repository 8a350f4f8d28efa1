#!/usr/bin/env python
"""Per-stage breakdown of the TRAIN step on the local accelerator —
the training analog of bench_stages.py.

Cumulative stages on the flagship model (same params):
  loss-fwd            forward losses only (no grad)
  loss-fwd+bwd        value_and_grad
  full step           + SGD update (the bench_train graph)
plus a separately-parameterized "fcos-only fwd+bwd" (mask/maskiou off)
to attribute the ROI-branch share.

Increments between cumulative stages are drift-robust: interleaved
sampling + per-arm minima (see bench_stages.timed_interleaved).

env: BENCH_EDGE (default 896), BENCH_BATCH (default 2),
     BENCH_ITERS (default 5), BENCH_S2D (0/1).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import numpy as np

from bench_stages import timed_interleaved  # noqa: E402 (same directory)


def main():
    from centermask2_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp

    from centermask2_tpu.models import CenterMask, GroundTruth
    from centermask2_tpu.train import make_optimizer
    from centermask2_tpu.train.trainer import (create_train_state,
                                               make_train_step)
    from centermask2_tpu.utils.measures import chip_peak_flops

    body = os.environ.get("BENCH_BODY", "V-39-eSE")
    edge = int(os.environ.get("BENCH_EDGE", "896"))
    B = int(os.environ.get("BENCH_BATCH", "2"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    s2d = os.environ.get("BENCH_S2D", "0") == "1"

    rng = np.random.RandomState(0)
    images_np = rng.randn(B, edge, edge, 3).astype(np.float32) * 30
    if s2d:
        from centermask2_tpu.data.preprocess import stem_space_to_depth
        images = jnp.asarray(stem_space_to_depth(images_np))
    else:
        images = jnp.asarray(images_np)
    G = 20
    boxes = np.zeros((B, G, 4), np.float32)
    boxes[..., 2:] = rng.uniform(40, edge / 2, (B, G, 2))
    boxes[..., :2] = rng.uniform(0, edge / 2, (B, G, 2))
    boxes[..., 2:] += boxes[..., :2]
    gt = GroundTruth(
        boxes=jnp.asarray(boxes),
        classes=jnp.asarray(rng.randint(0, 80, (B, G)), jnp.int32),
        valid=jnp.ones((B, G), bool),
        mask_patches=jnp.asarray(
            (rng.rand(B, G, 28, 28) > 0.5).astype(np.float32)))

    def build(mask_on):
        m = CenterMask(conv_body=body, mask_on=mask_on,
                       maskiou_on=mask_on, s2d_input=s2d)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), images[:1])
        return m, v

    model, variables = build(True)
    opt = make_optimizer(0.01, (60000, 80000),
                         params_example=variables["params"])
    state = create_train_state(variables, opt)
    step = make_train_step(model, opt)

    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(0), i)
                      for i in range(max(iters, 16))])

    def loss_total(m, v, im, k):
        losses = m.apply(v, im, gt, k, method=CenterMask.loss)
        return sum(jnp.asarray(list(losses.values())).ravel())

    def grad_consume(g):
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree.leaves(g))

    weights = jnp.linspace(1.0, 1.01, max(iters, 16))

    def chain_fwd(x, n):
        def body(i, acc):
            return acc + loss_total(model, variables, x * weights[i],
                                    keys[i])
        return jax.lax.fori_loop(0, n, body, 0.0)

    def chain_bwd(x, n):
        f = jax.value_and_grad(
            lambda v, im, k: loss_total(model, v, im, k))

        def body(i, acc):
            val, g = f(variables, x * weights[i], keys[i])
            return acc + val + grad_consume(g)
        return jax.lax.fori_loop(0, n, body, 0.0)

    def chain_step(x, n):
        def body(i, carry):
            acc, s = carry
            s2, metrics = step(s, x * weights[i], gt, keys[i])
            return (acc + metrics["total_loss"], s2)
        acc, _ = jax.lax.fori_loop(0, n, body, (0.0, state))
        return acc

    m_f, v_f = build(False)

    def chain_fcos_bwd(x, n):
        f = jax.value_and_grad(
            lambda v, im, k: loss_total(m_f, v, im, k))

        def body(i, acc):
            val, g = f(v_f, x * weights[i], keys[i])
            return acc + val + grad_consume(g)
        return jax.lax.fori_loop(0, n, body, 0.0)

    chains = [("loss-fwd", jax.jit(chain_fwd)),
              ("loss-fwd+bwd", jax.jit(chain_bwd)),
              ("full-step", jax.jit(chain_step)),
              ("fcos-only fwd+bwd", jax.jit(chain_fcos_bwd))]
    only = os.environ.get("BENCH_ONLY")  # comma list, e.g. smoke one stage
    if only:
        want = set(only.split(","))
        chains = [c for c in chains if c[0] in want]
    times = timed_interleaved(chains, images)

    # exact HLO flops of the single-call graphs for the roofline column
    def flops_of(fn, *args):
        try:
            c = jax.jit(fn).lower(*args).compile().cost_analysis()
            if isinstance(c, list):
                c = c[0]
            return float(c.get("flops", 0.0)) if c else 0.0
        except Exception:
            return 0.0

    fl_makers = {
        "loss-fwd": lambda: flops_of(
            lambda im: loss_total(model, variables, im, keys[0]), images),
        "loss-fwd+bwd": lambda: flops_of(
            lambda im: jax.value_and_grad(
                lambda v: loss_total(model, v, im, keys[0]))(variables)[0],
            images),
        "full-step": lambda: flops_of(
            lambda im: step(state, im, gt, keys[0])[1]["total_loss"], images),
        "fcos-only fwd+bwd": lambda: flops_of(
            lambda im: jax.value_and_grad(
                lambda v: loss_total(m_f, v, im, keys[0]))(v_f)[0], images),
    }
    fl = {k: fl_makers[k]() for k in times}

    fl = {k: v for k, v in fl.items() if k in times}

    peak = chip_peak_flops()
    print(f"\n{'stage':>20s} {'ms':>8s} {'GFLOP':>9s} {'TFLOP/s':>8s} "
          f"{'%peak':>6s}")
    for name, _ in chains:
        t = times[name]
        f = fl[name]
        tf = f / t / 1e12 if t > 0 else 0.0
        pct = 100.0 * f / t / peak if (t > 0 and peak) else 0.0
        print(f"{name:>20s} {t * 1000:8.2f} {f / 1e9:9.1f} {tf:8.1f} "
              f"{pct:6.1f}")
    if {"loss-fwd", "loss-fwd+bwd", "full-step",
            "fcos-only fwd+bwd"} <= set(times):
        bwd = times["loss-fwd+bwd"] - times["loss-fwd"]
        optu = times["full-step"] - times["loss-fwd+bwd"]
        roi = times["loss-fwd+bwd"] - times["fcos-only fwd+bwd"]
        print(f"\nincrements: backward {bwd * 1000:.2f} ms, optimizer "
              f"{optu * 1000:.2f} ms, ROI branch (fwd+bwd, incl. its fcos "
              f"interactions) {roi * 1000:.2f} ms")


if __name__ == "__main__":
    main()
