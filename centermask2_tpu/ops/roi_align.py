"""ROIAlign (V2 / aligned semantics) as a unified-gather XLA op.

TPU-native replacement for the detectron2 CUDA ROIAlign the reference
calls per level (reference: pooler.py:242-255, 343-365) and for the
fixed-shape ``RoiExtractor`` device op (pooler.py:46-67).

Design: instead of looping levels and scattering (the reference's
``output[inds] = pooler(x_level, ...)``), all FPN levels are flattened and
concatenated into one (S, C) table; each ROI's sample points are turned
into *global* row indices offset by its assigned level's base — one gather
serves every ROI at its own level, no per-level dispatch, no 3x redundant
pooling. All shapes static: (R, out, out, C) for R padded ROIs.

Bilinear tap semantics follow the CUDA kernel exactly: samples with
y < -1 or y > H contribute zero; in-range coordinates clamp to
[0, H-1] with taps at floor/floor+1.
"""

from __future__ import annotations

import sys
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _axis_coords(
    boxes: jnp.ndarray,  # (R, 4) in image coords
    scale: jnp.ndarray,  # (R,) spatial scale of each ROI's level
    output_size: int,
    sampling_ratio: int,
    aligned: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-axis sample positions (ys, xs), each (R, output_size*sampling_ratio)
    in level-feature coords; index p along an axis is bin p//s, tap p%s."""
    offset = 0.5 if aligned else 0.0
    x0 = boxes[:, 0] * scale - offset
    y0 = boxes[:, 1] * scale - offset
    x1 = boxes[:, 2] * scale - offset
    y1 = boxes[:, 3] * scale - offset
    roi_w = x1 - x0
    roi_h = y1 - y0
    if not aligned:  # legacy ROIAlign forces min size 1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    s = sampling_ratio
    n_pts = output_size * s
    # position of each sample along one axis, in bin units
    # cell ph, subsample iy -> y0 + (ph + (iy + .5)/s) * bin
    grid = (jnp.arange(n_pts, dtype=jnp.float32) + 0.5) / s  # (n_pts,)
    ys = y0[:, None] + grid[None, :] * (roi_h / output_size)[:, None]  # (R, n_pts)
    xs = x0[:, None] + grid[None, :] * (roi_w / output_size)[:, None]
    return ys, xs


def _sample_coords(
    boxes: jnp.ndarray,  # (R, 4) in image coords
    scale: jnp.ndarray,  # (R,) spatial scale of each ROI's level
    output_size: int,
    sampling_ratio: int,
    aligned: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (ys, xs): (R, P) sample coordinates in level-feature coords,
    P = (output_size * sampling_ratio)^2, ordered (ph, iy, pw, ix)."""
    n_pts = output_size * sampling_ratio
    ys, xs = _axis_coords(boxes, scale, output_size, sampling_ratio, aligned)
    # full 2D grid: (R, n_pts, n_pts)
    ys2 = jnp.broadcast_to(ys[:, :, None], (*ys.shape, n_pts))
    xs2 = jnp.broadcast_to(xs[:, None, :], (*xs.shape[:1], n_pts, n_pts))
    return ys2.reshape(ys.shape[0], -1), xs2.reshape(xs.shape[0], -1)


def _bilinear_taps(ys, xs, height, width):
    """CUDA-parity bilinear: returns (y_low, x_low, w1..w4 stacked, in_range).

    height/width may be per-ROI arrays (broadcast against (R, P))."""
    in_range = (ys >= -1.0) & (ys <= height) & (xs >= -1.0) & (xs <= width)
    y = jnp.clip(ys, 0.0)
    x = jnp.clip(xs, 0.0)
    y_low = jnp.floor(y)
    x_low = jnp.floor(x)
    # if y_low >= H-1: y_low = y_high = H-1, y = y_low
    y_low = jnp.minimum(y_low, height - 1)
    x_low = jnp.minimum(x_low, width - 1)
    y = jnp.minimum(y, height - 1)
    x = jnp.minimum(x, width - 1)
    ly = y - y_low
    lx = x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    w = jnp.stack([hy * hx, hy * lx, ly * hx, ly * lx], axis=-1)  # (R, P, 4)
    w = w * in_range[..., None]
    return y_low.astype(jnp.int32), x_low.astype(jnp.int32), w


def roi_align(
    features: jnp.ndarray,  # (H, W, C) one image, one level
    boxes: jnp.ndarray,  # (R, 4) xyxy in image coords
    spatial_scale: float,
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """Single-level ROIAlign -> (R, output_size, output_size, C)."""
    H, W, C = features.shape
    R = boxes.shape[0]
    scale = jnp.full((R,), spatial_scale, jnp.float32)
    ys, xs = _sample_coords(boxes.astype(jnp.float32), scale, output_size,
                            sampling_ratio, aligned)
    y_low, x_low, w = _bilinear_taps(ys, xs, float(H), float(W))
    flat = _blockify(features[None]).reshape(H * W, 4 * C)
    vals = _block_gather_combine(flat, y_low * W + x_low, w, C)
    return _bin_average(vals, output_size, sampling_ratio)


def _blockify(f: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H, W, 4C): each pixel's 2x2 bilinear
    neighborhood [f(y,x), f(y,x+1), f(y+1,x), f(y+1,x+1)] concatenated on
    channels, with +1 clamped at the border — exactly the
    y_high = min(y_low+1, H-1) / x_high = min(x_low+1, W-1) tap semantics
    of _bilinear_taps (y_low/x_low are already in range).

    Turns the 4-corner gather into ONE row gather from a 4C-wide table:
    4x fewer row DMAs at 4x the row size, and the corner combine becomes
    static minor-dim slices of one gathered buffer (no relayout). The
    table build is 5 streaming passes over the feature map, ~0.12 ms at
    the V-39@1344 P3-P5 working set vs the ~0.6 ms it removes from the
    gathers (profiled r4).

    Known headroom, deliberately left (r4): the fused table-build op
    runs at ~40% of its HBM bound (0.22 vs 0.09 ms at the 800x1088
    tight canvas) — the minor-dim 4C concat writes strided channel
    blocks. Candidate reformulations (major-axis (4,S,C) stack with a
    4-row gather; 2C x-block table with two row gathers) trade the
    single-row-DMA property this design exists for, and sub-0.2 ms A/B
    timing through the shared tunnel proved unmeasurable in degraded
    windows; the section sits at 93-108% of its bound either way."""
    fx = jnp.concatenate([f[:, :, 1:], f[:, :, -1:]], axis=2)
    fy = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
    fxy = jnp.concatenate([fx[:, 1:], fx[:, -1:]], axis=1)
    return jnp.concatenate([f, fx, fy, fxy], axis=-1)


def _block_gather_combine(flat4: jnp.ndarray, idx: jnp.ndarray,
                          w: jnp.ndarray, C: int) -> jnp.ndarray:
    """Weighted bilinear combine from a blockified (S, 4C) table:
    one (R, P) row gather, then four static channel-slice FMAs."""
    g = jnp.take(flat4, idx, axis=0, mode="clip")  # (R, P, 4C)
    out = None
    for t in range(4):
        part = g[..., t * C:(t + 1) * C] * w[:, :, t, None].astype(g.dtype)
        out = part if out is None else out + part
    return out


def _bin_average(vals: jnp.ndarray, output_size: int,
                 sampling_ratio: int) -> jnp.ndarray:
    """(R, P, C) sample points -> (R, o, o, C) bin means.

    As a matmul against a static (P, o*o) averaging matrix: the direct
    reshape(R, o, s, o, s, C).mean(axis=(2, 4)) lowers to a two-strided-
    axis reduce measured at 2x its bandwidth bound (0.214 ms at R=50,
    o=14, s=2 on v5e); the matmul form runs on the MXU, whose bf16 dot
    accumulates in f32 natively (no preferred_element_type: an explicit
    BF16xBF16=F32 dot is UNIMPLEMENTED on the CPU backend, and the s*s<=16
    term sum is exact-enough in either accumulator)."""
    o, s = output_size, sampling_ratio
    R, P, C = vals.shape
    pt_bin = (jnp.arange(P) // (s * o * s)) * o + (jnp.arange(P) // s) % o
    avg = (jax.nn.one_hot(pt_bin, o * o, dtype=vals.dtype)
           / jnp.asarray(s * s, vals.dtype))  # (P, o*o)
    out = jnp.einsum("rpc,pb->rbc", vals, avg)
    return out.reshape(R, o, o, C)


ADAPTIVE_SAMPLING_BUCKETS = (1, 2, 4)


def multilevel_roi_align(
    features: List[jnp.ndarray],  # per level: (N, Hl, Wl, C)
    boxes: jnp.ndarray,  # (R, 4) xyxy image coords
    batch_indices: jnp.ndarray,  # (R,) int
    levels: jnp.ndarray,  # (R,) int in [0, L)
    scales: Sequence[float],  # per level spatial scale (1/stride)
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
    separable_grad: bool = True,
) -> jnp.ndarray:
    """Multi-level ROIAlign via one unified gather -> (R, o, o, C).

    Replaces the reference's per-level nonzero+scatter loop
    (pooler.py:355-365) with level-offset global indices.

    ``separable_grad`` (default) installs a custom VJP that computes the
    feature gradient as two MXU matmuls per level (the bilinear+bin-average
    pool is separable: out_r = Ay_r @ feat @ Ax_r^T), replacing the
    row-scatter-add XLA autodiff emits for the gather — profiled at 7.5 ms
    (11% of the train step) vs ~0.5 ms for the matmul form at the V-39
    896^2/B=2 training shapes. Box/level/batch cotangents are zero, which
    is exact for the framework: torchvision's ROIAlign backward likewise
    only produces grad_input, and proposals are detached before ROI
    training (reference center_heads.py:178; models/meta.py:482).

    Both code paths share that grad_input-only contract: boxes (and the
    level/batch indices) are stop_gradient'ed here, so switching
    ``separable_grad`` can never change gradient semantics — without
    this, plain autodiff through the gather path would produce nonzero
    bilinear-weight box cotangents the custom-VJP path zeroes.

    ``sampling_ratio=0`` selects detectron2's adaptive semantics
    (grid = ceil(roi_size/output_size) samples per bin, the shipped
    configs' default via reference pooler.py:242-255), statically
    approximated by pooling at the bucket ratios {1, 2, 4} and selecting
    per ROI by ceil(max(roi_h, roi_w)/output_size) — exact whenever that
    ceil is a bucket value and the ROI is not extremely elongated
    (detectron2 counts h and w separately); clamped to 4 above. ~3x the
    gather cost of a fixed ratio; intended for AP-parity evaluation runs.
    """
    boxes = jax.lax.stop_gradient(boxes)
    if sampling_ratio == 0:
        pools = [
            multilevel_roi_align(features, boxes, batch_indices, levels,
                                 scales, output_size, s, aligned,
                                 separable_grad)
            for s in ADAPTIVE_SAMPLING_BUCKETS
        ]
        scales_arr = jnp.array(scales, jnp.float32)
        scale_r = jnp.take(scales_arr, jnp.clip(levels, 0, len(scales) - 1))
        bx = boxes.astype(jnp.float32)
        gh = jnp.ceil((bx[:, 3] - bx[:, 1]) * scale_r / output_size)
        gw = jnp.ceil((bx[:, 2] - bx[:, 0]) * scale_r / output_size)
        need = jnp.maximum(gh, gw)[:, None, None, None]
        out = pools[-1]
        for s, pool in zip(ADAPTIVE_SAMPLING_BUCKETS[-2::-1], pools[-2::-1]):
            out = jnp.where(need <= s, pool, out)
        return out

    if separable_grad:
        return _multilevel_roi_align_sep(
            list(features), boxes, batch_indices, levels,
            tuple(float(s) for s in scales), output_size, sampling_ratio,
            aligned)
    return _multilevel_impl(features, boxes, batch_indices, levels, scales,
                            output_size, sampling_ratio, aligned)


def _multilevel_impl(
    features: List[jnp.ndarray],
    boxes: jnp.ndarray,
    batch_indices: jnp.ndarray,
    levels: jnp.ndarray,
    scales: Sequence[float],
    output_size: int,
    sampling_ratio: int,
    aligned: bool,
) -> jnp.ndarray:
    L = len(features)
    C = features[0].shape[-1]
    R = boxes.shape[0]

    heights = jnp.array([f.shape[1] for f in features], jnp.float32)
    widths = jnp.array([f.shape[2] for f in features], jnp.float32)
    scales_arr = jnp.array(scales, jnp.float32)
    sizes = [f.shape[1] * f.shape[2] * f.shape[0] for f in features]
    bases = jnp.array([sum(sizes[:i]) for i in range(L)], jnp.int32)

    # blockified table: the per-level border clamp must happen in each
    # level's own (H, W) geometry, BEFORE flattening
    flat = jnp.concatenate(
        [_blockify(f).reshape(-1, 4 * C) for f in features], axis=0)

    lv = jnp.clip(levels, 0, L - 1)
    scale_r = jnp.take(scales_arr, lv)
    h_r = jnp.take(heights, lv)
    w_r = jnp.take(widths, lv)
    # base row of (batch b, level l) block
    hw_r = (h_r * w_r).astype(jnp.int32)
    base_r = jnp.take(bases, lv) + batch_indices.astype(jnp.int32) * hw_r

    ys, xs = _sample_coords(boxes.astype(jnp.float32), scale_r, output_size,
                            sampling_ratio, aligned)
    y_low, x_low, w = _bilinear_taps(ys, xs, h_r[:, None], w_r[:, None])
    wi = w_r[:, None].astype(jnp.int32)

    idx = y_low * wi + x_low + base_r[:, None]
    vals = _block_gather_combine(flat, idx, w, C)
    return _bin_average(vals, output_size, sampling_ratio)


def _axis_pool_matrix(coords, size, output_size, sampling_ratio, roi_mask,
                      offsets, total):
    """Dense 1-D pooling operator A: (R, output_size, total) f32 such that
    pooling along one axis is ``out[r, i] = sum_y A[r, i, y] * feat[y]``.

    Reproduces `_bilinear_taps`' CUDA-parity semantics exactly per axis:
    in-range window [-1, size], clamp to [0, size-1], high tap at
    min(low+1, size-1) (the `_blockify` border duplication), and the
    1/sampling_ratio share of `_bin_average`. ``offsets`` (or None) shifts
    rows into a (n_blocks*size)-tall output for batch folding; ``roi_mask``
    zeroes ROIs not assigned to this level."""
    fsize = float(size)
    inr = (coords >= -1.0) & (coords <= fsize)
    c = jnp.clip(coords, 0.0)
    low = jnp.minimum(jnp.floor(c), fsize - 1.0)
    c = jnp.minimum(c, fsize - 1.0)
    lw = c - low
    hw = 1.0 - lw
    low_i = low.astype(jnp.int32)
    high_i = jnp.minimum(low_i + 1, size - 1)
    if offsets is not None:
        low_i = low_i + offsets[:, None]
        high_i = high_i + offsets[:, None]
    w = (hw[..., None] * jax.nn.one_hot(low_i, total, dtype=jnp.float32)
         + lw[..., None] * jax.nn.one_hot(high_i, total, dtype=jnp.float32))
    w = w * (inr & roi_mask[:, None])[..., None]
    R, n_pts = coords.shape
    w = w.reshape(R, output_size, sampling_ratio, total)
    return w.sum(axis=2) / sampling_ratio


def _separable_feature_grad(g, boxes, batch_indices, levels, shapes, dtypes,
                            scales, output_size, sampling_ratio, aligned):
    """Feature cotangent of `_multilevel_impl` as per-level matmuls.

    The pool is separable — out[r,i,j,c] = sum_y Ay[r,i,y] sum_x Ax[r,j,x]
    feat[b_r, y, x, c] — so its transpose is
    dfeat[n,y,x,c] = sum_{r,i} Ay'[r,i,n*H+y] sum_j Ax[r,j,x] g[r,i,j,c]
    with the batch index folded into Ay's row space. Two dot_generals per
    level (one small batched (o,o)x(o,W), one big (N*H, R*o)x(R*o, W*C))
    instead of the R*P-row scatter-add XLA emits for the gather's VJP."""
    L = len(shapes)
    o, s = output_size, sampling_ratio
    lv = jnp.clip(levels, 0, L - 1)
    scale_r = jnp.take(jnp.array(scales, jnp.float32), lv)
    ys, xs = _axis_coords(boxes.astype(jnp.float32), scale_r, o, s, aligned)
    bidx = batch_indices.astype(jnp.int32)
    grads = []
    for lvl, (N, H, W, C) in enumerate(shapes):
        on_l = lv == lvl
        ay = _axis_pool_matrix(ys, H, o, s, on_l, bidx * H, N * H)
        ax = _axis_pool_matrix(xs, W, o, s, on_l, None, W)
        tmp = jnp.einsum("rjx,rijc->rixc", ax.astype(g.dtype), g)
        d = jnp.einsum("riy,rixc->yxc", ay.astype(g.dtype), tmp)
        grads.append(d.reshape(N, H, W, C).astype(dtypes[lvl]))
    return grads


def _multilevel_roi_align_sep(features, boxes, batch_indices, levels, scales,
                              output_size, sampling_ratio, aligned):
    """`_multilevel_impl` with the separable-matmul feature VJP installed."""
    shapes = tuple(f.shape for f in features)
    dtypes = tuple(f.dtype for f in features)

    @jax.custom_vjp
    def pooled(feats, bxs, bidx, lvl):
        return _multilevel_impl(feats, bxs, bidx, lvl, scales, output_size,
                                sampling_ratio, aligned)

    def fwd(feats, bxs, bidx, lvl):
        out = _multilevel_impl(feats, bxs, bidx, lvl, scales, output_size,
                               sampling_ratio, aligned)
        return out, (bxs, bidx, lvl)

    def bwd(res, g):
        bxs, bidx, lvl = res
        dfeats = _separable_feature_grad(
            g, bxs, bidx, lvl, shapes, dtypes, scales, output_size,
            sampling_ratio, aligned)
        return (dfeats, jnp.zeros_like(bxs),
                np.zeros(bidx.shape, jax.dtypes.float0),
                np.zeros(lvl.shape, jax.dtypes.float0))

    pooled.defvjp(fwd, bwd)
    return pooled(features, boxes, batch_indices, levels)


def assign_boxes_by_ratio(
    box_areas: jnp.ndarray,
    img_areas: jnp.ndarray,
    min_level: int,
    max_level: int,
) -> jnp.ndarray:
    """CenterMask adaptive ROI level assignment, Eqn (2)
    (reference pooler.py:111-118): ceil(max - log2(img_area/box_area + eps)),
    clamped. Returns 0-based level offsets."""
    eps = sys.float_info.epsilon  # the reference uses the double eps
    ratio = img_areas / jnp.maximum(box_areas, 1e-12)
    lv = jnp.ceil(max_level - jnp.log2(ratio + eps))
    lv = jnp.clip(lv, min_level, max_level)
    return lv.astype(jnp.int32) - min_level


def assign_boxes_by_area(
    box_areas: jnp.ndarray,
    min_level: int,
    max_level: int,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN paper Eqn (1) assignment (reference pooler.py:121-152)."""
    sizes = jnp.sqrt(jnp.maximum(box_areas, 0.0))
    eps = sys.float_info.epsilon
    lv = jnp.floor(
        canonical_level + jnp.log2(sizes / canonical_box_size + eps)
    )
    lv = jnp.clip(lv, min_level, max_level)
    return lv.astype(jnp.int32) - min_level
