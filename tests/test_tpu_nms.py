"""TPU-hardware exactness tier for the fused Pallas NMS kernel.

CPU CI pins the Pallas kernel in interpret mode (tests/test_ops.py); this
tier pins the COMPILED kernel on the real chip against the pure-XLA tiled
fixpoint and, transitively, the sequential greedy oracle: the keep sets
must be bit-identical (same f32 IoU arithmetic in the same order — see
ops/nms_pallas.py). Also crosses the vmapped (B>1) decode_batch shape.
Reference semantics: torchvision batched_nms at reference ml_nms.py:93.

Run with:
  CM2_TEST_PLATFORM=axon python -m pytest tests/test_tpu_nms.py -m tpu
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centermask2_tpu.ops import nms

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.devices()[0].platform not in ("tpu", "axon"),
        reason="requires TPU hardware (CM2_TEST_PLATFORM=axon)"),
]


def _clustered(rng, n, n_obj=40, n_cls=80, span=1000.0):
    obj = rng.rand(n_obj, 2) * span
    pick = rng.randint(0, n_obj, n)
    centers = obj[pick] + rng.randn(n, 2) * 12
    sizes = 30 + rng.rand(n, 2) * 120
    boxes = np.concatenate([centers, centers + sizes], 1).astype(np.float32)
    classes = (pick % n_cls).astype(np.int32)
    # the coordinate-offset trick used by ml_nms: one IoU matrix for all
    # classes
    off = boxes + (classes[:, None] * 2.0 * span).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    valid = scores > 0.25
    return off, scores, valid


def _run(boxes, scores, valid, thr, pallas):
    os.environ["CM2_NMS_PALLAS"] = "1" if pallas else "0"
    try:
        # distinct closure per mode: a fresh trace re-evaluates the route
        f = jax.jit(lambda b, s, v: nms.nms_keep_mask(
            b + (0.0 if pallas else 1.0) * 0.0, s, v, thr))
        return np.asarray(jax.block_until_ready(
            f(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))))
    finally:
        os.environ.pop("CM2_NMS_PALLAS", None)


@pytest.mark.parametrize("n", [500, 1000, 2000])
def test_pallas_nms_hardware_matches_xla(n):
    rng = np.random.RandomState(n)
    boxes, scores, valid = _clustered(rng, n)
    for thr in (0.4, 0.6):
        kp = _run(boxes, scores, valid, thr, pallas=True)
        kx = _run(boxes, scores, valid, thr, pallas=False)
        np.testing.assert_array_equal(kp, kx, err_msg=f"n={n} thr={thr}")
        assert kp.sum() > 0


def test_pallas_nms_hardware_vmap():
    rng = np.random.RandomState(0)
    B, n = 4, 512
    boxes = np.stack([_clustered(rng, n)[0] for _ in range(B)])
    scores = rng.rand(B, n).astype(np.float32)
    valid = scores > 0.2

    def batched(pallas):
        os.environ["CM2_NMS_PALLAS"] = "1" if pallas else "0"
        try:
            f = jax.jit(jax.vmap(lambda b, s, v: nms.nms_keep_mask(
                b + (0.0 if pallas else 1.0) * 0.0, s, v, 0.5)))
            return np.asarray(jax.block_until_ready(
                f(jnp.asarray(boxes), jnp.asarray(scores),
                  jnp.asarray(valid))))
        finally:
            os.environ.pop("CM2_NMS_PALLAS", None)

    np.testing.assert_array_equal(batched(True), batched(False))
