"""Pallas TPU kernel for the tiled greedy NMS core.

Motivation (r4 roofline): decode+NMS is the one pipeline section below
its attainable bound (0.24 ms measured vs 0.08 bound at the 800x1088
tight canvas; ~0.16 ms of it flopless sort/NMS control flow). The XLA
implementation in ops/nms.py runs the greedy sweep as a fori_loop over
score tiles with a nested while_loop fixpoint per tile — ~8 outer
dispatch rounds plus a few while iterations each, every one paying
XLA's sequential-dispatch latency on ~microsecond-sized vector work.

This kernel runs the IDENTICAL algorithm (same tile schedule, same
fixpoint, same f32 IoU arithmetic as structures/boxes.py::pairwise_iou,
so the keep set is bit-identical) inside ONE kernel launch:

- per tile, the (tile, N) IoU block is recomputed on the VPU from two
  orientations of the box table (columns (tile, 1) x rows (1, N)) —
  ~15 elementwise ops on 128x1024 f32, cheaper than staging a
  precomputed matrix through HBM;
- cross-tile suppression and the in-tile fixpoint are (1, tile)-row
  mat-vec products on the MXU (exact: 0/1 operands, integer-valued
  f32 accumulation), so "any kept earlier box overlaps j" is one dot;
- the keep row lives in VMEM for the whole sweep; sequential latency is
  the in-kernel loop trip, not a dispatch round-trip.

The wrapper in ops/nms.py selects this kernel on TPU backends (env
CM2_NMS_PALLAS=0 opts out) and keeps the pure-XLA path everywhere else;
tests pin keep-set equality in interpret mode and (tpu tier) on
hardware. Reference semantics: torchvision batched_nms as used at
reference ml_nms.py:93 (score-sorted greedy, IoU > threshold).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (tile, N) f32 IoU block + a few temporaries must fit VMEM alongside the
# box tables; 128x8192 f32 is 4 MB — past this, fall back to the XLA path.
MAX_PALLAS_N = 8192


def _kernel(boxes_ref, rows_ref, valid_ref, keep_ref, *, tile: int,
            thresh: float):
    """boxes_ref: (N, 4) f32 sorted by descending score (pad rows zero).
    rows_ref:  (8, N) f32 — rows 0..3 = x1, y1, x2, y2, row 4 = area.
    valid_ref: (1, N) f32 0/1.
    keep_ref:  (1, N) f32 0/1 out (kept mask over the sorted order)."""
    n = boxes_ref.shape[0]
    num_tiles = n // tile
    keep_ref[...] = jnp.zeros((1, n), jnp.float32)

    ax1 = rows_ref[0:1, :]
    ay1 = rows_ref[1:2, :]
    ax2 = rows_ref[2:3, :]
    ay2 = rows_ref[3:4, :]
    aa = rows_ref[4:5, :]
    thr = jnp.float32(thresh)

    def overlap_block(tx1, ty1, tx2, ty2, ta, bx1, by1, bx2, by2, ba):
        """IoU > thr for tile columns (t, 1) against box rows (1, m) —
        the exact pairwise_iou arithmetic (f32 ops in the same order)."""
        iw = jnp.maximum(jnp.minimum(tx2, bx2) - jnp.maximum(tx1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(ty2, by2) - jnp.maximum(ty1, by1), 0.0)
        inter = iw * ih
        union = ta + ba - inter
        pos = union > 0.0
        iou = jnp.where(pos, inter / jnp.where(pos, union, 1.0), 0.0)
        return (iou > thr).astype(jnp.float32)

    def outer(t, carry):
        start = t * tile
        tb = boxes_ref[pl.ds(start, tile), :]  # (tile, 4)
        tx1, ty1 = tb[:, 0:1], tb[:, 1:2]
        tx2, ty2 = tb[:, 2:3], tb[:, 3:4]
        ta = (tx2 - tx1) * (ty2 - ty1)

        # 1) suppression by already-kept earlier boxes: keep cols for this
        # and later tiles are still zero, so no index masking is needed.
        ov_all = overlap_block(tx1, ty1, tx2, ty2, ta,
                               ax1, ay1, ax2, ay2, aa)  # (tile, n)
        keep_row = keep_ref[0:1, :]
        sup0 = jax.lax.dot_general(
            keep_row, ov_all, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (1, tile): kept-overlap counts
        valid_t = valid_ref[0:1, pl.ds(start, tile)]
        alive0 = valid_t * (sup0 == 0.0).astype(jnp.float32)

        # 2) in-tile greedy via the fixpoint iteration (ops/nms.py
        # _greedy_fixpoint): M[i, j] = overlap & (i < j), strict upper.
        bx1 = rows_ref[0:1, pl.ds(start, tile)]
        by1 = rows_ref[1:2, pl.ds(start, tile)]
        bx2 = rows_ref[2:3, pl.ds(start, tile)]
        by2 = rows_ref[3:4, pl.ds(start, tile)]
        ba = rows_ref[4:5, pl.ds(start, tile)]
        ov_tt = overlap_block(tx1, ty1, tx2, ty2, ta,
                              bx1, by1, bx2, by2, ba)  # (tile, tile)
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        m = ov_tt * (i_idx < j_idx).astype(jnp.float32)

        def cond(state):
            it, alive, changed = state
            return jnp.logical_and(changed, it <= tile + 1)

        def body(state):
            it, alive, _ = state
            sup = jax.lax.dot_general(
                alive, m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (1, tile)
            new = alive0 * (sup == 0.0).astype(jnp.float32)
            return it + 1, new, jnp.any(new != alive)

        _, alive, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), alive0, jnp.bool_(True)))
        keep_ref[0:1, pl.ds(start, tile)] = alive
        return carry

    jax.lax.fori_loop(0, num_tiles, outer, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("iou_threshold", "tile",
                                             "interpret"))
def greedy_keep_sorted(
    sboxes: jnp.ndarray,  # (N, 4) f32, descending-score order, N % tile == 0
    svalid: jnp.ndarray,  # (N,) bool
    iou_threshold: float,
    tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Kept mask (N,) bool over the sorted order — the Pallas equivalent
    of the fori_loop core in ops/nms.py::nms_keep_mask."""
    n = sboxes.shape[0]
    assert n % tile == 0, (n, tile)
    # NMS is non-differentiable (bool keep mask; the XLA path's grads
    # through its comparisons are identically zero). pallas_call has no
    # autodiff rule, so sever the tangents here — otherwise the train
    # step fails to linearize when proposals feed the ROI heads.
    sboxes = jax.lax.stop_gradient(sboxes)
    svalid = jax.lax.stop_gradient(svalid)
    sboxes = sboxes.astype(jnp.float32)
    x1, y1, x2, y2 = (sboxes[:, k] for k in range(4))
    rows = jnp.zeros((8, n), jnp.float32)
    rows = rows.at[0].set(x1).at[1].set(y1).at[2].set(x2).at[3].set(y2)
    rows = rows.at[4].set((x2 - x1) * (y2 - y1))
    valid_row = svalid.astype(jnp.float32)[None, :]

    keep = pl.pallas_call(
        functools.partial(_kernel, tile=tile, thresh=float(iou_threshold)),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sboxes, rows, valid_row)
    return keep[0] > 0.5
