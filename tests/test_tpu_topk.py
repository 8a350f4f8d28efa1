"""TPU-hardware exactness tier for the decode top-k paths.

The decode's exact paths (approx_max_k recall_target=1.0 below 64k, and
the 40k split-merge above) must return the SAME VALUES as lax.top_k —
bit-identical — and the same indices wherever values are distinct. What
TPU hardware does NOT guarantee (measured here on v5e, and now stated in
models/fcos/outputs.py): the ORDER of indices among exactly-equal
values. lax.top_k breaks ties lower-index-first; the PartialReduce path
returns the same value multiset with a different tie permutation. The
decode is insensitive to this: masked (-1) entries fail the `> 0`
validity check, and equal-score candidate reorderings only permute
genuinely tied detections.

CPU CI exercises JAX's exact fallback, so this tier pins the claim on
the real chip. Run with:
  CM2_TEST_PLATFORM=axon python -m pytest tests/test_tpu_topk.py -m tpu
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centermask2_tpu.models.fcos.outputs import _top_k

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.devices()[0].platform not in ("tpu", "axon"),
        reason="requires TPU hardware (CM2_TEST_PLATFORM=axon)"),
]


def _cases(n, rng):
    # distinct-valued inputs: indices must match exactly
    dense = rng.randn(n).astype(np.float32)
    masked = np.full(n, -1.0, np.float32)
    hot = rng.choice(n, 2000, replace=False)
    masked[hot] = (rng.rand(2000) + 0.01).astype(np.float32)
    # tie-heavy inputs: values must match exactly, indices as a set per
    # value group
    tied = (rng.randint(0, 97, n).astype(np.float32) / 97.0)
    dup = masked.copy()
    dup[hot] = np.maximum(np.round(dup[hot] * 8) / 8.0, 0.01)
    return {"dense": (dense, True), "masked": (masked, True),
            "tied": (tied, False), "dup": (dup, False)}


@pytest.mark.parametrize("n", [37_600, 80_000, 130_000])
@pytest.mark.parametrize("k", [1000])
def test_exact_topk_matches_lax_topk(n, k):
    rng = np.random.RandomState(0)
    f = jax.jit(lambda a: _top_k(a, k, approx=False))
    g = jax.jit(lambda a: jax.lax.top_k(a, k))
    for name, (x, distinct) in _cases(n, rng).items():
        xj = jnp.asarray(x)
        v1, i1 = jax.tree.map(np.asarray, f(xj))
        v2, i2 = jax.tree.map(np.asarray, g(xj))
        np.testing.assert_array_equal(v1, v2, err_msg=f"{name} n={n} values")
        # gathered values must be consistent with the returned indices
        np.testing.assert_array_equal(x[i1], v1,
                                      err_msg=f"{name} n={n} gather")
        if distinct:
            np.testing.assert_array_equal(
                i1, i2, err_msg=f"{name} n={n} indices")
        else:
            # above the k-th value every tied group is fully included, so
            # the index SETS must agree; the partially-included boundary
            # group is implementation-defined in any exact top-k
            kth = v2[-1]
            np.testing.assert_array_equal(
                np.sort(i1[v1 > kth]), np.sort(i2[v2 > kth]),
                err_msg=f"{name} n={n} supra-threshold index sets")
