"""FLOPs / parameter / memory measurement.

Replaces the reference's forward-hook op counter
(reference: centermask2/centermask/utils/measures.py:40-192) with XLA's
own cost analysis: the compiled HLO reports exact flops and bytes for the
whole program, covering every op (the reference's hook approach misses
anything without a registered hook).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import numpy as np


def count_params(params: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def param_bytes(params: Any) -> int:
    return sum(int(np.prod(p.shape)) * p.dtype.itemsize
               for p in jax.tree.leaves(params))


def measure_model(fn: Callable, *example_args, static_argnums=()) -> Dict[str, float]:
    """Compile ``fn`` and return {'flops', 'bytes_accessed', ...} from XLA
    cost analysis (the measure_model analog)."""
    lowered = jax.jit(fn, static_argnums=static_argnums).lower(*example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    out = {}
    for key in ("flops", "bytes accessed", "transcendentals"):
        if cost and key in cost:
            out[key.replace(" ", "_")] = float(cost[key])
    try:
        mem = compiled.memory_analysis()
        out["peak_temp_bytes"] = float(getattr(mem, "temp_size_in_bytes", 0))
        out["output_bytes"] = float(getattr(mem, "output_size_in_bytes", 0))
    except Exception:
        pass
    return out


def summarize(fn: Callable, params: Any, *example_args) -> Dict[str, float]:
    out = measure_model(fn, params, *example_args)
    out["params"] = float(count_params(params))
    out["param_bytes"] = float(param_bytes(params))
    return out
