"""Fixed-shape AOT export.

The convert_model_into_onnx.py analog (reference :23-97): instead of
torch->ONNX tracing + graph surgery, the jitted inference function is
lowered and serialized with jax.export — a portable StableHLO artifact
with the exact 6-tensor output contract, loadable without the Python
model definition.
"""

from __future__ import annotations

import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def lower_inference(model, variables, input_shape: Tuple[int, ...]):
    """Lower model.apply on a fixed input shape; returns the Lowered obj."""
    def fn(images):
        return model.apply(variables, images)

    x = jax.ShapeDtypeStruct(input_shape, jnp.float32)
    return jax.jit(fn).lower(x)


def _register_output_serialization():
    from jax import export as jax_export

    from centermask2_tpu.models.meta import InferenceOutputs

    try:
        jax_export.register_namedtuple_serialization(
            InferenceOutputs,
            serialized_name="centermask2_tpu.InferenceOutputs")
    except ValueError:
        pass  # already registered


def export_serialized(model, variables, input_shape: Tuple[int, ...],
                      path: str, *, input_dtype=jnp.float32,
                      canvas_hw: Tuple[int, int] = None) -> str:
    """Serialize the inference function (weights baked in) to ``path``.

    Default: the f32 full-canvas program, callable(images). With
    ``input_dtype=jnp.uint8`` (the raw-s2d-pack serving mode) the
    artifact is callable(images, valid_hw) — valid_hw (B, 2) int32
    drives on-device normalization; pass ``canvas_hw`` too when
    ``input_shape`` is a TIGHT pack (s2d_pack_u8_tight) so the program
    pads it back to the deployment square."""
    from jax import export as jax_export

    _register_output_serialization()

    if input_dtype == jnp.uint8:
        def fn(images, valid_hw):
            return model.apply(variables, images, None, valid_hw,
                               canvas_hw=canvas_hw)
        args = (jax.ShapeDtypeStruct(input_shape, jnp.uint8),
                jax.ShapeDtypeStruct((input_shape[0], 2), jnp.int32))
    else:
        def fn(images):
            return model.apply(variables, images)
        args = (jax.ShapeDtypeStruct(input_shape, input_dtype),)

    exported = jax_export.export(jax.jit(fn))(*args)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_serialized(path: str) -> Callable:
    """Load a serialized artifact -> callable(images) -> outputs."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call


def compile_inference(model, variables, input_shape: Tuple[int, ...]):
    """AOT-compile; returns (compiled, cost_analysis dict)."""
    lowered = lower_inference(model, variables, input_shape)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return compiled, cost
