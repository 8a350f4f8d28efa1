"""Data-parallel training step (pjit/shard_map over a 1-D mesh).

The TPU equivalent of the reference's DDP training (SURVEY.md §3.4):
batch sharded over the ``data`` axis, parameters replicated, gradients
psum-averaged, and the FCOS loss normalizers cross-replica via the same
axis (models/fcos/losses.py). One jitted function per step; no host sync
except metrics fetch.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from centermask2_tpu.models import CenterMask


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params: Any, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def make_train_step(
    model: CenterMask,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
):
    """Returns train_step(state, images, gt, rng) -> (state, metrics).

    With a mesh, the step is shard_mapped: each replica computes its local
    loss (with psum'd normalizers inside, matching the reference's
    all_reduce semantics) and gradients are psum-averaged.
    """

    def loss_fn(params, images, gt, rng, axis_name):
        losses = model.apply(params, images, gt, rng,
                             axis_name=axis_name, method=CenterMask.loss)
        total = sum(losses.values())
        return total, losses

    def local_step(state: TrainState, images, gt, rng, axis_name=None):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, gt, rng, axis_name)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            losses = jax.lax.pmean(losses, axis_name)
            total = jax.lax.pmean(total, axis_name)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return TrainState(state.step + 1, new_params, new_opt), metrics

    if mesh is None:
        return jax.jit(local_step)

    rep = P()
    sharded = P(axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, sharded, sharded, rep),
        out_specs=(rep, rep),
        check_rep=False,
    )
    def sharded_step(state, images, gt, rng):
        return local_step(state, images, gt, rng, axis_name=axis)

    return jax.jit(sharded_step)
