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
    """MODEL.BACKBONE.FREEZE_AT -> backbone module-name prefixes to freeze.

    Matches the reference's VoVNet._freeze_backbone (vovnet.py:455-469):
    stage index 0 is the stem, index i (>0) is OSA stage i+1; FREEZE_AT=2
    (the shipped default) freezes stem_* and OSA2_*.
    """
    names = []
    if freeze_at >= 1:
        names.append("stem")
    for s in range(2, freeze_at + 1):
        names.append(f"OSA{s}_")
    return tuple(names)


def _is_frozen(path: tuple, prefixes: tuple = ()) -> bool:
    keys = [str(k) for k in path]
    if any(k.startswith("frozen_") for k in keys):
        return True
    if prefixes and "backbone" in keys:
        return any(k.startswith(p) for k in keys for p in prefixes)
    return False


def _is_norm_or_bias(path: tuple) -> bool:
    keys = [str(k) for k in path]
    leaf = keys[-1]
    if leaf == "bias":
        return False  # d2 default applies full wd to biases
    if _is_frozen(path):
        return True
    return "gn" in keys or leaf in ("scale",)


def make_optimizer(
    base_lr: float,
    steps: Sequence[int],
    *,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    weight_decay_norm: float = 0.0,
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 1000,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
    clip_value: float = 0.0,
    freeze_at: int = 0,
    params_example: Any = None,
) -> optax.GradientTransformation:
    schedule = warmup_multistep_schedule(
        base_lr, steps, gamma, warmup_factor, warmup_iters, warmup_method)
    prefixes = freeze_prefixes(freeze_at)

    def decay_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: not _is_norm_or_bias(tuple(k.key for k in p)), params)

    def frozen_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: _is_frozen(tuple(k.key for k in p), prefixes), params)

    chain = []
    if clip_value and clip_value > 0:
        chain.append(optax.clip(clip_value))
    if weight_decay:
        chain.append(optax.masked(
            optax.add_decayed_weights(weight_decay), decay_mask))
    chain.append(optax.sgd(learning_rate=schedule, momentum=momentum))
    # zero out updates for frozen params entirely (masked() alone would
    # pass raw gradients through for masked-out leaves)
    chain.append(optax.masked(optax.set_to_zero(), frozen_mask))
    return optax.chain(*chain)
