"""Pallas TPU kernel for multi-level ROIAlign.

Kernel strategy: one grid step per ROI. The FPN levels are pre-flattened
into one (S, C) row table in HBM (same unified layout as the XLA version
in ops/roi_align.py). For each ROI the kernel:

1. reads the ROI's box/level scalars from SMEM (scalar prefetch),
2. computes the (P, 4) bilinear tap row indices and weights on the VPU,
3. DMAs the needed rows from the HBM table into VMEM tap-by-tap via a
   per-sample-point dynamic-slice copy loop (double-buffered),
4. accumulates weight * row into the (P, C) sample buffer,
5. average-pools the sampling grid into the (out, out, C) output block.

This keeps HBM traffic to exactly the 4*P rows each ROI touches instead
of gathering through XLA's generic gather lowering. ops/roi_align.py remains the portable
reference implementation and the numerical oracle in tests.

Status: numerically verified in interpret mode; real Mosaic compilation
currently fails on the target stack (per-tap dynamic HBM slicing), while
trivial kernels compile — the XLA gather (1.49 ms / 50 ROIs measured) is
the production path until the DMA pattern is reworked to per-ROI region
copies.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _bilinear_taps, _sample_coords


def _roi_align_kernel(
    # scalar prefetch
    rows_ref,  # (R, P4) int32 row index of every tap
    # inputs
    weights_ref,  # (P4, 1) f32 tap weights for THIS roi (blocked over grid)
    table_ref,  # (S, C) feature rows in ANY/HBM
    # output
    out_ref,  # (P4, C) weighted rows for THIS roi
    # scratch
    row_buf,  # VMEM (2, 1, C)
    sem,  # DMA sems (2,)
    *,
    num_taps: int,
):
    r = pl.program_id(0)

    def get_dma(slot, tap):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(rows_ref[r, tap], 1), :],
            row_buf.at[slot],
            sem.at[slot],
        )

    get_dma(0, 0).start()

    def body(tap, _):
        slot = tap % 2

        @pl.when(tap + 1 < num_taps)
        def _():
            get_dma((tap + 1) % 2, tap + 1).start()

        get_dma(slot, tap).wait()
        out_ref[pl.ds(tap, 1), :] = (
            row_buf[slot] * weights_ref[tap, 0]
        ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_taps, body, 0)


def multilevel_roi_align_pallas(
    features: List[jnp.ndarray],  # per level (N, Hl, Wl, C)
    boxes: jnp.ndarray,  # (R, 4)
    batch_indices: jnp.ndarray,  # (R,)
    levels: jnp.ndarray,  # (R,)
    scales: Sequence[float],
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Same contract as ops.roi_align.multilevel_roi_align."""
    L = len(features)
    C = features[0].shape[-1]
    R = boxes.shape[0]

    heights = jnp.array([f.shape[1] for f in features], jnp.float32)
    widths = jnp.array([f.shape[2] for f in features], jnp.float32)
    scales_arr = jnp.array(scales, jnp.float32)
    sizes = [f.shape[1] * f.shape[2] * f.shape[0] for f in features]
    bases = jnp.array([sum(sizes[:i]) for i in range(L)], jnp.int32)

    table = jnp.concatenate([f.reshape(-1, C) for f in features], axis=0)

    lv = jnp.clip(levels, 0, L - 1)
    scale_r = jnp.take(scales_arr, lv)
    h_r = jnp.take(heights, lv)
    w_r = jnp.take(widths, lv)
    hw_r = (h_r * w_r).astype(jnp.int32)
    base_r = jnp.take(bases, lv) + batch_indices.astype(jnp.int32) * hw_r

    ys, xs = _sample_coords(boxes.astype(jnp.float32), scale_r, output_size,
                            sampling_ratio, aligned)
    y_low, x_low, w = _bilinear_taps(ys, xs, h_r[:, None], w_r[:, None])
    wi = w_r[:, None].astype(jnp.int32)
    hi = h_r[:, None].astype(jnp.int32)
    y_high = jnp.minimum(y_low + 1, hi - 1)
    x_high = jnp.minimum(x_low + 1, wi - 1)

    idx = jnp.stack(
        [y_low * wi + x_low, y_low * wi + x_high,
         y_high * wi + x_low, y_high * wi + x_high], axis=-1)
    idx = (idx + base_r[:, None, None]).astype(jnp.int32)

    P = idx.shape[1]
    P4 = P * 4
    rows = idx.reshape(R, P4)
    weights = w.reshape(R, P4, 1).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((None, P4, 1), lambda r, rows: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, P4, C), lambda r, rows: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    weighted = pl.pallas_call(
        functools.partial(_roi_align_kernel, num_taps=P4),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, P4, C), jnp.float32),
        interpret=interpret,
    )(rows, weights, table.astype(jnp.float32))

    # combine taps + average the sampling grid
    s = sampling_ratio
    o = output_size
    vals = weighted.reshape(R, P, 4, C).sum(axis=2)
    vals = vals.reshape(R, o, s, o, s, C)
    return vals.mean(axis=(2, 4))
