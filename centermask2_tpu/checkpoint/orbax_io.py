"""Orbax checkpoint save/load — the DetectionCheckpointer analog.

The reference delegates checkpointing to detectron2's
DetectionCheckpointer (convert_model_into_onnx.py:66, tester.py:161);
here Orbax persists the train state (params + optimizer + step) with the
same cadence contract (SOLVER.CHECKPOINT_PERIOD).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, state: Any, step: int) -> str:
    """Save a pytree state under directory/step_{N}."""
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Load a pytree; ``target`` (same-structure example with shaped leaves)
    restores concrete dtypes/shardings."""
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, target)
    return ckptr.restore(path)


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(os.path.abspath(directory), f"step_{max(steps)}")
