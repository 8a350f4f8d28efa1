"""Pallas TPU kernel for multi-level ROIAlign.

Kernel strategy: one grid step per ROI. The FPN levels are pre-flattened
into one row table in HBM (same unified layout as the XLA version in
ops/roi_align.py), reshaped to (S, C/128, 128) — Mosaic on the target
stack rejects single-sublane rows wider than one 128-lane tile, so the
lane tiles become an explicit dimension. For each ROI the kernel:

1. reads the ROI's tap row indices from SMEM (scalar prefetch),
2. double-buffers per-tap row DMAs from the HBM table into VMEM,
3. writes each row into the ROI's (P*4, C/128, 128) output block.

Bilinear tap weights and the sampling-grid average are applied outside
the kernel (one fused XLA elementwise+reduce pass): keeping the kernel
a pure gather avoids sub-lane-width weight blocks.

ops/roi_align.py remains the portable reference implementation and the
numerical oracle in tests.

DECISION (round 2): the XLA unified gather (ops/roi_align.py) is the
production path. Benchmark on one v5e, 50 ROIs / 256 ch / 14x14 / ratio 2:
XLA gather ~1.6 ms, this kernel 26.7 ms — per-tap row DMAs are
latency-bound, and a fix would need per-ROI *region* DMAs (one contiguous
(h, w, C) bounding-window copy + VMEM-local bilinear), which static
shapes can't bound: ROI sizes are data-dependent up to the whole level.
The kernel is kept as the repository's worked example of scalar-prefetch
+ double-buffered DMA gather in Pallas (bit-exact, tested in
tests/test_ops.py) and is NOT wired into any model path.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _bilinear_taps, _sample_coords, multilevel_roi_align

LANE = 128


def _gather_rows_kernel(rows_ref, table_ref, out_ref, row_buf, sem, *,
                        num_taps: int):
    r = pl.program_id(0)

    def get_dma(slot, tap):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(rows_ref[r, tap], 1)],
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
        out_ref[pl.ds(tap, 1)] = row_buf[slot]
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
    if C % LANE != 0:
        return multilevel_roi_align(features, boxes, batch_indices, levels,
                                    scales, output_size, sampling_ratio,
                                    aligned)
    Cd = C // LANE
    R = boxes.shape[0]

    heights = jnp.array([f.shape[1] for f in features], jnp.float32)
    widths = jnp.array([f.shape[2] for f in features], jnp.float32)
    scales_arr = jnp.array(scales, jnp.float32)
    sizes = [f.shape[1] * f.shape[2] * f.shape[0] for f in features]
    bases = jnp.array([sum(sizes[:i]) for i in range(L)], jnp.int32)

    table = jnp.concatenate([f.reshape(-1, C) for f in features], axis=0)
    table3 = table.astype(jnp.float32).reshape(-1, Cd, LANE)

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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((None, P4, Cd, LANE),
                               lambda r, rows: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, Cd, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    gathered = pl.pallas_call(
        functools.partial(_gather_rows_kernel, num_taps=P4),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, P4, Cd, LANE), jnp.float32),
        interpret=interpret,
    )(rows, table3)

    # weights + tap combine + sampling-grid average, fused by XLA
    vals = gathered.reshape(R, P, 4, C) * w[..., None]
    vals = vals.sum(axis=2)
    s = sampling_ratio
    o = output_size
    return vals.reshape(R, o, s, o, s, C).mean(axis=(2, 4))
