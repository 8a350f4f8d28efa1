"""Masked selection — the framework's nonzero replacement.

The reference emulates ``nonzero`` with topk for its fixed-shape deployment
(reference: fcos_outputs.py:14-36, pooler.py:15-43, demos/replace_Nozero.py).
Here that trick is the native idiom: selection returns a fixed-size index
buffer plus a validity mask.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_topk(
    scores: jnp.ndarray, mask: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k of ``scores`` restricted to ``mask``; padded with invalid slots.

    Returns (indices (k,), valid (k,), values (k,)). Invalid slots carry
    NEG_INF values and arbitrary indices (clipped in-range).
    """
    masked = jnp.where(mask, scores, NEG_INF)
    vals, idx = jax.lax.top_k(masked, k)
    valid = vals > NEG_INF / 2
    return idx, valid, vals


def nonzero_padded(mask: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First-k true positions of a boolean vector, in index order.

    Static-shape ``nonzero``: returns (indices (k,), valid (k,)).
    """
    n = mask.shape[0]
    # rank true elements by position: score = -index for trues
    order = jnp.arange(n, dtype=jnp.int32)
    idx, valid, _ = masked_topk(-order.astype(jnp.float32), mask, k)
    return idx, valid
