"""Optimizer + LR schedule matching the reference training recipe.

detectron2's default solver as the reference configs use it
(reference: configs/centermask/Base-CenterMask-VoVNet.yaml:29-33 +
detectron2 defaults): SGD momentum 0.9, weight decay 1e-4
(0 on norm layers), linear warmup (factor 1/1000, 1000 iters), multistep
gamma 0.1 at STEPS.

Frozen parameters (FrozenBN scale/bias, named ``frozen_*``) receive zero
updates — the mask replaces the reference's requires_grad=False freezing
(vovnet.py:455-469).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax


def warmup_multistep_schedule(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 1000,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
):
    """WarmupMultiStepLR (detectron2 solver)."""
    milestones = jnp.asarray(sorted(steps))

    def schedule(count):
        it = jnp.asarray(count, jnp.float32)
        if warmup_method == "linear":
            alpha = jnp.clip(it / max(warmup_iters, 1), 0.0, 1.0)
            warm = warmup_factor * (1 - alpha) + alpha
        else:  # constant
            warm = jnp.where(it < warmup_iters, warmup_factor, 1.0)
        decay = gamma ** jnp.sum(it >= milestones)
        return base_lr * warm * decay

    return schedule


def freeze_prefixes(freeze_at: int) -> tuple:
    """MODEL.BACKBONE.FREEZE_AT -> backbone module-name patterns to freeze,
    for every backbone family:

    - VoVNet (reference vovnet.py:455-469): stage 0 is the stem
      (``stem_*``), stage i (>0) is ``OSA{i+1}_*``;
    - ResNet (detectron2 ResNet.freeze): stage 1 is the stem
      (``stem_conv1``), stage i (>1) is ``res{i}_{block}``;
    - MobileNetV2 (reference mobilenet.py:119-122): freezes
      ``features[0..freeze_at-1]`` (here ``features0_*`` and the exact
      module names ``features{i}``).

    A trailing ``$`` marks an exact module-name match (``features1``
    must not also freeze ``features10``); anything else is a prefix.
    """
    names = []
    if freeze_at >= 1:
        names.append("stem")  # vovnet stem_1..3, resnet stem_conv1
        names.append("features0_")  # mobilenet features[0] conv/bn
    for s in range(2, freeze_at + 1):
        names.append(f"OSA{s}_")
        names.append(f"res{s}_")
    for i in range(1, freeze_at):
        names.append(f"features{i}$")
    return tuple(names)


def _match(key: str, pattern: str) -> bool:
    if pattern.endswith("$"):
        return key == pattern[:-1]
    return key.startswith(pattern)


def _is_frozen(path: tuple, prefixes: tuple = ()) -> bool:
    keys = [str(k) for k in path]
    if any(k.startswith("frozen_") for k in keys):
        return True
    if prefixes and "backbone" in keys:
        return any(_match(k, p) for k in keys for p in prefixes)
    return False


def _is_norm_module(path: tuple) -> bool:
    """Param belongs to a norm layer (FrozenBN / BN / GN), bias included —
    d2's get_default_optimizer_params assigns WEIGHT_DECAY_NORM to every
    param of a norm module."""
    keys = [str(k) for k in path]
    if any(k.startswith("frozen_") for k in keys):
        return True
    return any(k in ("gn", "norm") or k.endswith("_norm") for k in keys)


def _is_norm_or_bias(path: tuple) -> bool:
    """Decay-exempt set for the base SOLVER.WEIGHT_DECAY: norm-module
    params (incl. their biases; they get WEIGHT_DECAY_NORM instead) and
    the FCOS per-level Scale. Conv/linear biases keep full wd (d2
    WEIGHT_DECAY_BIAS default == WEIGHT_DECAY)."""
    if _is_norm_module(path):
        return True
    keys = [str(k) for k in path]
    return keys[-1] == "scale"


def make_optimizer(
    base_lr: float,
    steps: Sequence[int],
    *,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    weight_decay_norm: float = 0.0,
    nesterov: bool = False,
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 1000,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
    clip_value: float = 0.0,
    clip_type: str = "value",
    freeze_at: int = 0,
    params_example: Any = None,
) -> optax.GradientTransformation:
    schedule = warmup_multistep_schedule(
        base_lr, steps, gamma, warmup_factor, warmup_iters, warmup_method)
    prefixes = freeze_prefixes(freeze_at)

    def decay_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: not _is_norm_or_bias(tuple(k.key for k in p)), params)

    def norm_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: _is_norm_module(tuple(k.key for k in p)), params)

    def frozen_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: _is_frozen(tuple(k.key for k in p), prefixes), params)

    chain = []
    if clip_value and clip_value > 0:
        # d2 SOLVER.CLIP_GRADIENTS.CLIP_TYPE: "value" clips each gradient
        # element to +-clip_value; "norm" rescales the whole pytree to a
        # global L2 norm of clip_value (torch clip_grad_norm_ semantics)
        if clip_type == "norm":
            chain.append(optax.clip_by_global_norm(clip_value))
        elif clip_type == "value":
            chain.append(optax.clip(clip_value))
        else:
            raise ValueError(f"unsupported clip_type: {clip_type!r}")
    if weight_decay:
        chain.append(optax.masked(
            optax.add_decayed_weights(weight_decay), decay_mask))
    if weight_decay_norm:  # SOLVER.WEIGHT_DECAY_NORM (d2 default 0)
        chain.append(optax.masked(
            optax.add_decayed_weights(weight_decay_norm), norm_mask))
    chain.append(optax.sgd(learning_rate=schedule, momentum=momentum,
                           nesterov=nesterov))
    # zero out updates for frozen params entirely (masked() alone would
    # pass raw gradients through for masked-out leaves)
    chain.append(optax.masked(optax.set_to_zero(), frozen_mask))
    return optax.chain(*chain)
