"""End-to-end inference benchmark on the flagship config.

Measures single-image latency of the full CenterMask2 V-39-eSE pipeline
(backbone -> FPN -> FCOS decode+NMS -> SAG-Mask -> MaskIoU) at the
reference's fixed 1344x1344 deployment shape (deploy_utils.py:19-21).

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
vs_baseline is speedup over the reference's 0.050 s/image
(README.md:171-173; BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp_cache")
    import jax

    from centermask2_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax.numpy as jnp

    from centermask2_tpu.data.preprocess import stem_space_to_depth
    from centermask2_tpu.models import CenterMask

    edge = int(os.environ.get("BENCH_EDGE", "1344"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    model = CenterMask(
        conv_body="V-39-eSE",
        mask_on=True,
        maskiou_on=True,
        post_nms_topk_test=50,
        nms_candidates=1000,
        s2d_input=True,  # host s2d is part of preprocessing (TPU.S2D_STEM_INPUT)
    )
    rng = np.random.RandomState(0)
    x_img = rng.randn(1, edge, edge, 3).astype(np.float32) * 30.0
    x = jnp.asarray(stem_space_to_depth(x_img))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # serve in bf16: casting 37M fp32 params to bf16 once here instead of
    # inside every forward saves ~220MB of HBM traffic per inference
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    # Timing: n model evaluations inside ONE jitted fori_loop, each on a
    # distinct input (per-iteration scale) with outputs accumulated into
    # the result. This defeats loop-invariant hoisting / algebraic folding
    # (an epsilon-perturbation chain gets elided by XLA) and keeps
    # compilation out of the timed region (n stays traced: one compile
    # serves every n).
    max_n = max(iters, 64)
    weights = jnp.linspace(1.0, 1.01, max_n)

    def chained(p, im, n):
        def body(i, acc):
            out = model.apply(p, im * weights[i])
            return acc + out.scores

        k = model.post_nms_topk_test
        return jax.lax.fori_loop(0, n, body, jnp.zeros((1, k), jnp.float32))

    fn = jax.jit(chained)
    jax.block_until_ready(fn(params, x, 1))  # compile + warm up

    best = float("inf")
    # best-of-8: the axon tunnel time-shares, so individual repeats see
    # up to ~1 ms of interference; min is the honest device number
    for _ in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params, x, 1))
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params, x, iters))
        t_many = time.perf_counter() - t0
        # subtract the fixed dispatch overhead measured by n=1
        best = min(best, (t_many - t_one) / (iters - 1))
    dt = max(best, 1e-9)

    ms = dt * 1000.0
    baseline_s = 0.050  # reference V100 inference time (README.md:171-173)

    # batched throughput: per-image cost with batch=B amortizes the small
    # per-program ops (decode/NMS/ROI) across images. Best-effort: a
    # failure here must never lose the primary metric.
    B = int(os.environ.get("BENCH_BATCH", "4"))
    batched_ms = ms
    try:
        if B > 1:
            xb = jnp.tile(x, (B, 1, 1, 1))

            def chained_b(p, im, n):
                def body(i, acc):
                    # lax.map over the single-image program: XLA's B>1
                    # conv layouts regress (see CenterMask.inference_batched)
                    out = model.apply(p, im * weights[i],
                                      method="inference_batched")
                    return acc + out.scores

                k = model.post_nms_topk_test
                return jax.lax.fori_loop(0, n, body,
                                         jnp.zeros((B, k), jnp.float32))

            fnb = jax.jit(chained_b)
            jax.block_until_ready(fnb(params, xb, 1))
            bt = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                jax.block_until_ready(fnb(params, xb, 1))
                t_one = time.perf_counter() - t0
                t0 = time.perf_counter()
                jax.block_until_ready(fnb(params, xb, 10))
                t_many = time.perf_counter() - t0
                bt = min(bt, (t_many - t_one) / 9)
            batched_ms = bt / B * 1000.0
    except Exception as e:  # pragma: no cover
        print(f"[warn] batched bench failed: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "centermask2_v39_inference_latency_1344",
        "value": round(ms, 3),
        "unit": "ms/image",
        "vs_baseline": round(baseline_s / dt, 3),
        "batched_ms_per_image": round(batched_ms, 3),
        "batched_images_per_sec": round(1000.0 / batched_ms, 2),
        "batch": B,
    }))


if __name__ == "__main__":
    main()
