#!/usr/bin/env python
"""Demo: static-shape nonzero via masked top-k.

The reference proved its NonZero->TopK export trick with two standalone
demos (reference: demos/replace_Nozero.py, demos/create_onnx_from_scratch.py
— a hand-built ONNX graph and a traced torch module validated against
onnxruntime). In this framework the trick is a first-class op
(centermask2_tpu/ops/select.py); this demo shows the same 1-D and 2-D
equivalences against numpy's nonzero, under jit, with fixed shapes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from centermask2_tpu.utils.platform import apply_platform_override
apply_platform_override()
import jax.numpy as jnp
import numpy as np

from centermask2_tpu.ops import masked_topk, nonzero_padded


def main():
    rng = np.random.RandomState(0)

    # --- 1-D: first-k true positions, static output shape
    x = rng.rand(64) > 0.8
    k = 16
    idx, valid = jax.jit(lambda m: nonzero_padded(m, k))(jnp.asarray(x))
    ref = np.nonzero(x)[0]
    got = np.asarray(idx)[np.asarray(valid)]
    assert list(got) == list(ref[:k]), (got, ref)
    print(f"1-D nonzero: {len(ref)} true -> padded[{k}] ok")

    # --- 2-D: (row, col) pairs via flat top-k + divmod (the reference's
    # fcos_outputs.py:14-36 emulation)
    m2 = rng.rand(50, 80) > 0.97
    k2 = 128
    flat = jnp.asarray(m2).reshape(-1)
    idx, valid = jax.jit(lambda m: nonzero_padded(m, k2))(flat)
    rows = np.asarray(idx) // 80
    cols = np.asarray(idx) % 80
    v = np.asarray(valid)
    ref_r, ref_c = np.nonzero(m2)
    assert list(rows[v]) == list(ref_r[:k2])
    assert list(cols[v]) == list(ref_c[:k2])
    print(f"2-D nonzero: {len(ref_r)} true -> (row, col) pairs ok")

    # --- score-ranked selection (what decode actually uses)
    scores = jnp.asarray(rng.rand(1000).astype(np.float32))
    mask = scores > 0.5
    idx, valid, vals = jax.jit(lambda s, m: masked_topk(s, m, 100))(scores, mask)
    assert bool(jnp.all(vals[np.asarray(valid)] > 0.5))
    print("masked top-k selection ok")
    print("all demos passed")


if __name__ == "__main__":
    main()
