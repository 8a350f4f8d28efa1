"""Golden regression test: pinned end-to-end outputs on a canonical input.

The reference's QA ladder pins implementations against each other on one
canonical image (SURVEY.md §4, check_layers_outputs.py fixture). Here the
fixture pins THIS implementation against its own history: any future
refactor that silently changes decode/NMS/mask numerics fails this test.

Regenerate deliberately after an intended numeric change:
  CM2_PLATFORM=cpu python tests/test_golden.py --regen
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_tiny.npz")


def build():
    from centermask2_tpu.models import CenterMask

    # approx_topk pinned off: golden history must use exact reference
    # numerics (the shipped TPU default is approximate, ADVICE round 1)
    model = CenterMask(
        conv_body="V-19-slim-eSE", post_nms_topk_test=10, pre_nms_topk_test=50,
        nms_candidates=100, approx_topk=False, dtype=jnp.float32)
    rng = np.random.RandomState(1234)
    x = jnp.asarray(rng.randn(1, 128, 160, 3).astype(np.float32) * 40.0)
    params = model.init(jax.random.PRNGKey(42), x)
    out = model.apply(params, x)
    return jax.tree.map(np.asarray, out)


def test_golden_outputs():
    if not os.path.exists(FIXTURE):
        pytest.skip("golden fixture not generated yet")
    out = build()
    ref = np.load(FIXTURE)
    np.testing.assert_array_equal(np.asarray(out.valid), ref["valid"])
    v = ref["valid"][0]
    np.testing.assert_allclose(np.asarray(out.scores)[0][v], ref["scores"][0][v],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.pred_boxes)[0][v],
                               ref["pred_boxes"][0][v], rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out.pred_classes)[0][v],
                                  ref["pred_classes"][0][v])
    np.testing.assert_allclose(np.asarray(out.mask_scores)[0][v],
                               ref["mask_scores"][0][v], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.pred_masks)[0][v],
                               ref["pred_masks"][0][v], rtol=1e-3, atol=1e-4)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        out = build()
        np.savez_compressed(
            FIXTURE,
            valid=np.asarray(out.valid),
            scores=np.asarray(out.scores),
            pred_boxes=np.asarray(out.pred_boxes),
            pred_classes=np.asarray(out.pred_classes),
            mask_scores=np.asarray(out.mask_scores),
            pred_masks=np.asarray(out.pred_masks),
        )
        print(f"wrote {FIXTURE}")
