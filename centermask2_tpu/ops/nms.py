"""Static-shape (padded) NMS.

TPU-native replacement for torchvision ``batched_nms`` as used at
reference ml_nms.py:93 and for the fixed-output ``BatchMultiClassNMS``
device op (ml_nms.py:7-36): greedy class-aware NMS over a fixed-capacity
candidate buffer, returning a fixed number of output slots plus validity.

Exact greedy semantics (identical suppression decisions to the sequential
CUDA/CPU algorithm) via a fori_loop over the score-sorted candidates; the
IoU matrix is formed once on the VPU. Class separation uses the
torchvision coordinate-offset trick so one IoU matrix serves all classes.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from centermask2_tpu.structures import boxes as box_ops


def _use_pallas(n_padded: int) -> bool:
    """Route the greedy sweep through the fused Pallas kernel on TPU
    backends (ops/nms_pallas.py — one launch instead of ~8 dispatch
    rounds). CM2_NMS_PALLAS=0 opts out; =1 forces (for A/B timing).
    Decided at trace time from the backend actually executing."""
    flag = os.environ.get("CM2_NMS_PALLAS", "")
    if flag == "0":
        return False
    from centermask2_tpu.ops import nms_pallas
    if n_padded > nms_pallas.MAX_PALLAS_N:
        return False
    if flag == "1":
        return True
    try:
        dev = jax.devices()[0]
    except Exception:  # backend init failure: stay on the XLA path
        return False
    return "tpu" in getattr(dev, "device_kind", "").lower()


def _greedy_fixpoint(sup_mat: jnp.ndarray, alive0: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy suppression over a score-sorted tile via fixpoint
    iteration.

    sup_mat[i, j] = True iff box i (earlier in score order) overlaps box j
    beyond the threshold (strict upper triangle). Iterates
    alive <- alive0 & ~any(sup_mat & alive[:, None]) until stable; the
    unique fixpoint is the greedy keep set (j kept iff no kept i<j
    overlaps it), reached in at most depth(suppression DAG) iterations —
    typically a handful, vs one sequential step per box.
    """
    t = alive0.shape[0]

    def cond(state):
        it, alive, changed = state
        return changed & (it <= t + 1)

    def body(state):
        it, alive, _ = state
        sup = jnp.any(sup_mat & alive[:, None], axis=0)
        new_alive = alive0 & ~sup
        return it + 1, new_alive, jnp.any(new_alive != alive)

    _, alive, _ = jax.lax.while_loop(cond, body, (0, alive0, jnp.asarray(True)))
    return alive


def nms_keep_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    tile: int = 128,
) -> jnp.ndarray:
    """Greedy NMS over (N, 4) boxes; returns kept mask (N,) bool.

    Exact greedy semantics (same keep set as the sequential CUDA/CPU
    algorithm), evaluated tile-wise: boxes are score-sorted and processed
    in tiles of ``tile``; each tile is first suppressed by already-kept
    earlier boxes (one matrix op), then resolved internally by the
    fixpoint iteration above. Sequential chain length drops from N to
    ~N/tile outer steps (+ a few fixpoint steps each).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    sboxes = jnp.take(boxes, order, axis=0)
    svalid = jnp.take(valid, order)

    if n % tile != 0:
        pad = tile - n % tile
        sboxes = jnp.concatenate([sboxes, jnp.zeros((pad, 4), sboxes.dtype)])
        svalid = jnp.concatenate([svalid, jnp.zeros((pad,), bool)])
    np_ = sboxes.shape[0]
    num_tiles = np_ // tile

    if _use_pallas(np_):
        from centermask2_tpu.ops import nms_pallas
        keep_sorted = nms_pallas.greedy_keep_sorted(
            sboxes, svalid, float(iou_threshold), tile=tile)
        keep = jnp.zeros((n,), bool).at[order].set(keep_sorted[:n])
        return keep

    iou = box_ops.pairwise_iou(sboxes, sboxes)  # (np, np)
    overlap = iou > iou_threshold
    col = jnp.arange(np_)

    def outer(t_idx, keep):
        start = t_idx * tile
        rows = jax.lax.dynamic_slice_in_dim(overlap, start, tile, axis=0)
        # (tile, np): overlap of this tile's boxes onto everything
        tile_valid = jax.lax.dynamic_slice_in_dim(svalid, start, tile)
        # 1) suppression by kept boxes from earlier tiles
        earlier_kept = keep & (col < start)
        onto_tile = jax.lax.dynamic_slice_in_dim(
            overlap.T, start, tile, axis=0)  # (tile, np): others onto tile
        sup0 = jnp.any(onto_tile & earlier_kept[None, :], axis=1)
        alive0 = tile_valid & ~sup0
        # 2) within-tile greedy via fixpoint
        intra = jax.lax.dynamic_slice(rows, (0, start), (tile, tile))
        tri = jnp.tril(jnp.ones((tile, tile), bool), -1).T  # strict upper
        alive = _greedy_fixpoint(intra & tri, alive0)
        return jax.lax.dynamic_update_slice(keep, alive, (start,))

    keep_sorted = jax.lax.fori_loop(0, num_tiles, outer, svalid)
    # scatter back: sorted position i holds original row order[i]
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted[:n])
    return keep


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Class-aware NMS via per-class coordinate offsets
    (torchvision batched_nms trick). Returns kept mask (N,)."""
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    offsets = classes.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms_keep_mask(shifted, scores, valid, iou_threshold)


def nms_select(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS + top-``max_out`` by score.

    Returns (indices (max_out,), out_valid (max_out,)) into the input
    buffers, ordered by descending score — the static equivalent of
    ml_nms + post-NMS topk (reference fcos_outputs.py:468-495).
    """
    keep = batched_nms(boxes, scores, classes, valid, iou_threshold)
    kept_scores = jnp.where(keep, scores, -jnp.inf)
    n = kept_scores.shape[0]
    if max_out > n:  # fewer candidates than output slots: pad with dead rows
        kept_scores = jnp.concatenate(
            [kept_scores, jnp.full((max_out - n,), -jnp.inf)])
    top_scores, idx = jax.lax.top_k(kept_scores, max_out)
    idx = jnp.minimum(idx, n - 1)
    out_valid = top_scores > -jnp.inf
    return idx, out_valid
