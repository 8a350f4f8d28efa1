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
    params: Any  # {"params": ...} variables subtree (trainable)
    opt_state: Any
    model_state: Any = None  # non-trainable collections (BN batch_stats)


def create_train_state(variables: Any,
                       optimizer: optax.GradientTransformation) -> TrainState:
    """variables: the full model.init output. Non-``params`` collections
    (BatchNorm ``batch_stats``) split into ``model_state`` and are updated
    through the forward pass rather than the optimizer."""
    variables = dict(variables)
    params = {"params": variables.pop("params")}
    model_state = variables or None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        model_state=model_state,
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

    def loss_fn(params, model_state, images, gt, rng, axis_name):
        variables = {**params, **(model_state or {})}
        if model_state:  # train-mode BN: batch_stats updates in-forward
            losses, new_state = model.apply(
                variables, images, gt, rng, axis_name=axis_name,
                method=CenterMask.loss, mutable=list(model_state))
        else:
            losses = model.apply(variables, images, gt, rng,
                                 axis_name=axis_name, method=CenterMask.loss)
            new_state = None
        total = sum(losses.values())
        return total, (losses, new_state)

    def local_step(state: TrainState, images, gt, rng, axis_name=None):
        (total, (losses, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.params, state.model_state, images, gt, rng, axis_name)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            losses = jax.lax.pmean(losses, axis_name)
            total = jax.lax.pmean(total, axis_name)
            if new_state is not None:
                # plain BN: average the per-replica running stats (SyncBN
                # already psums the batch moments inside the forward)
                new_state = jax.lax.pmean(new_state, axis_name)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return TrainState(state.step + 1, new_params, new_opt,
                          new_state), metrics

    # Donate the input TrainState: without aliasing, every jit-boundary
    # step pays a full copy of params + momentum (~300 MB f32 for the
    # flagship) that the chained-fori_loop benchmarks never see — real
    # training (tools/train_net.py) does. Callers must not reuse the
    # input state after the call (standard flax TrainState discipline);
    # inside an outer trace (lax.fori_loop bodies, nested jit) the
    # donation annotation is inert, so the benchmarking tools are
    # unaffected.
    if mesh is None:
        return jax.jit(local_step, donate_argnums=(0,))

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

    return jax.jit(sharded_step, donate_argnums=(0,))
