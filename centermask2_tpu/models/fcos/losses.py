"""FCOS training targets and losses, fully vectorized + masked.

Rebuilt from reference modeling/fcos/fcos_outputs.py:
- ground-truth assignment (compute_targets_for_locations :266-315 and
  get_sample_region :229-259): per-(location, gt) geometry computed as one
  (L, G) grid instead of the reference's per-image python loop,
- loss math (fcos_losses :76-132): sigmoid focal (cls), ctrness-weighted
  GIoU (box), BCE (ctrness), with the two cross-replica normalizers
  (num_pos_avg, ctrness_norm) computed via jax.lax.psum — the TPU-native
  replacement for the reference's dist.all_reduce (utils/comm.py:5-11).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from centermask2_tpu.ops import iou_loss, optax_sigmoid_bce, sigmoid_focal_loss

INF = 100000000.0


def level_metadata(
    num_locs: Sequence[int], strides: Sequence[int], sizes_of_interest: Sequence[int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-location stride and size-of-interest range, concatenated over
    levels (reference fcos.py:52-58 builds [[-1,64],[64,128],...])."""
    soi: List[Tuple[float, float]] = []
    prev = -1.0
    for s in sizes_of_interest:
        soi.append((prev, float(s)))
        prev = float(s)
    soi.append((prev, INF))

    strides_per_loc = jnp.concatenate(
        [jnp.full((n,), float(s)) for n, s in zip(num_locs, strides)]
    )
    ranges_per_loc = jnp.concatenate(
        [jnp.tile(jnp.array([r], jnp.float32), (n, 1)) for n, r in zip(num_locs, soi)]
    )
    return strides_per_loc, ranges_per_loc


def assign_targets_single_image(
    locations: jnp.ndarray,  # (L, 2) concatenated over levels
    strides_per_loc: jnp.ndarray,  # (L,)
    size_ranges: jnp.ndarray,  # (L, 2)
    gt_boxes: jnp.ndarray,  # (G, 4) padded
    gt_classes: jnp.ndarray,  # (G,) int
    gt_valid: jnp.ndarray,  # (G,) bool
    num_classes: int,
    center_sample: bool = True,
    radius: float = 1.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (labels (L,), reg_targets (L, 4) in *pixels*).

    labels == num_classes means background. Invalid gt rows can never be
    assigned (their area is forced to INF).
    """
    xs, ys = locations[:, 0], locations[:, 1]
    gx0, gy0, gx1, gy1 = gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2], gt_boxes[:, 3]

    l = xs[:, None] - gx0[None, :]
    t = ys[:, None] - gy0[None, :]
    r = gx1[None, :] - xs[:, None]
    b = gy1[None, :] - ys[:, None]
    reg_targets = jnp.stack([l, t, r, b], axis=2)  # (L, G, 4)

    if center_sample:
        # center region of each gt, clamped inside the gt box, with radius
        # proportional to the location's level stride (get_sample_region)
        cx = (gx0 + gx1) / 2
        cy = (gy0 + gy1) / 2
        rad = strides_per_loc[:, None] * radius  # (L, 1)
        xmin = jnp.maximum(cx[None, :] - rad, gx0[None, :])
        ymin = jnp.maximum(cy[None, :] - rad, gy0[None, :])
        xmax = jnp.minimum(cx[None, :] + rad, gx1[None, :])
        ymax = jnp.minimum(cy[None, :] + rad, gy1[None, :])
        cl = xs[:, None] - xmin
        ct = ys[:, None] - ymin
        cr = xmax - xs[:, None]
        cb = ymax - ys[:, None]
        inside = jnp.min(jnp.stack([cl, ct, cr, cb], axis=2), axis=2) > 0
    else:
        inside = jnp.min(reg_targets, axis=2) > 0

    max_reg = jnp.max(reg_targets, axis=2)  # (L, G)
    cared = (max_reg >= size_ranges[:, 0:1]) & (max_reg <= size_ranges[:, 1:2])

    areas = (gx1 - gx0) * (gy1 - gy0)  # (G,)
    loc_to_gt_area = jnp.broadcast_to(areas[None, :], inside.shape)
    loc_to_gt_area = jnp.where(inside & cared & gt_valid[None, :], loc_to_gt_area, INF)

    min_area = jnp.min(loc_to_gt_area, axis=1)  # (L,)
    gt_inds = jnp.argmin(loc_to_gt_area, axis=1)  # (L,)

    # select the argmin row via a one-hot contraction: per-location
    # gathers over the G axis (take / take_along_axis) lower to kCustom
    # dynamic-gathers costing 2.2 ms/step on v5e at 896^2 (~0 bytes
    # moved — pure serialization); the one-hot multiply-reduce is a
    # streaming pass over the (L, G, 4) targets already in registers.
    # Exact: one_hot rows are {0,1} and class ids << 2^24.
    oh = jax.nn.one_hot(gt_inds, gt_classes.shape[0], dtype=jnp.float32)
    labels = jnp.sum(oh * gt_classes.astype(jnp.float32)[None, :], axis=1)
    labels = jnp.where(min_area == INF, num_classes, labels.astype(jnp.int32))
    reg = jnp.einsum("lg,lgd->ld", oh, reg_targets)
    return labels.astype(jnp.int32), reg


def compute_ctrness_targets(reg_targets: jnp.ndarray) -> jnp.ndarray:
    """sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b)))
    (reference fcos_outputs.py:66-73), safe on padded rows."""
    lr = reg_targets[:, jnp.array([0, 2])]
    tb = reg_targets[:, jnp.array([1, 3])]
    lr_min, lr_max = jnp.min(lr, axis=-1), jnp.max(lr, axis=-1)
    tb_min, tb_max = jnp.min(tb, axis=-1), jnp.max(tb, axis=-1)
    ratio = (lr_min / jnp.maximum(lr_max, 1e-12)) * (tb_min / jnp.maximum(tb_max, 1e-12))
    return jnp.sqrt(jnp.clip(ratio, 0.0))


def _cross_replica_sum(x: jnp.ndarray, axis_name: Optional[str]) -> jnp.ndarray:
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def fcos_losses(
    labels: jnp.ndarray,  # (T,) int, num_classes == background
    reg_targets: jnp.ndarray,  # (T, 4) stride-normalized
    logits_pred: jnp.ndarray,  # (T, C)
    reg_pred: jnp.ndarray,  # (T, 4) stride-normalized
    ctrness_pred: jnp.ndarray,  # (T,)
    num_classes: int,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
    loc_loss_type: str = "giou",
    axis_name: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """Masked re-derivation of reference fcos_losses (fcos_outputs.py:76-132).

    The normalizers are *means across replicas* (reference: all-reduce sum
    divided by world size); here psum over ``axis_name`` / axis size.
    """
    pos_mask = (labels != num_classes) & (labels >= 0)
    posf = pos_mask.astype(jnp.float32)

    num_pos_local = jnp.sum(posf)
    world = 1.0 if axis_name is None else jax.lax.axis_size(axis_name)
    total_num_pos = _cross_replica_sum(num_pos_local, axis_name)
    num_pos_avg = jnp.maximum(total_num_pos / world, 1.0)

    class_target = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32) * posf[:, None]
    class_loss = (
        jnp.sum(sigmoid_focal_loss(logits_pred.astype(jnp.float32), class_target,
                                   focal_alpha, focal_gamma))
        / num_pos_avg
    )

    ctr_targets = compute_ctrness_targets(reg_targets) * posf
    ctr_sum = jnp.sum(ctr_targets)
    ctrness_norm = jnp.maximum(_cross_replica_sum(ctr_sum, axis_name) / world, 1e-6)

    reg_loss = (
        iou_loss(reg_pred.astype(jnp.float32), reg_targets,
                 weight=ctr_targets, loss_type=loc_loss_type)
        / ctrness_norm
    )

    ctr_loss = (
        jnp.sum(optax_sigmoid_bce(ctrness_pred.astype(jnp.float32), ctr_targets) * posf)
        / num_pos_avg
    )

    return {
        "loss_fcos_cls": class_loss,
        "loss_fcos_loc": reg_loss,
        "loss_fcos_ctr": ctr_loss,
    }
