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
    import jax
    import jax.numpy as jnp

    from centermask2_tpu.models import CenterMask

    edge = int(os.environ.get("BENCH_EDGE", "1344"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    model = CenterMask(
        conv_body="V-39-eSE",
        mask_on=True,
        maskiou_on=True,
        post_nms_topk_test=50,
        nms_candidates=1000,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, edge, edge, 3).astype(np.float32) * 30.0)
    params = model.init(jax.random.PRNGKey(0), x)

    fn = jax.jit(lambda p, im: model.apply(p, im))
    out = fn(params, x)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    ms = dt * 1000.0
    baseline_s = 0.050  # reference V100 inference time (README.md:171-173)
    print(json.dumps({
        "metric": "centermask2_v39_inference_latency_1344",
        "value": round(ms, 3),
        "unit": "ms/image",
        "vs_baseline": round(baseline_s / dt, 3),
    }))


if __name__ == "__main__":
    main()
