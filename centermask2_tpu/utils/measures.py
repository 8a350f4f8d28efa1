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


# Peak dense bf16 matmul throughput per chip (FLOP/s), by device_kind
# substring. Sources: public TPU spec sheets (v4 275, v5e 197, v5p 459,
# v6e/Trillium 918 TFLOP/s bf16).
_CHIP_PEAKS = (
    ("v6", 918e12),
    ("v5p", 459e12),
    ("v5 lite", 197e12),
    ("v5litepod", 197e12),
    ("v5e", 197e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def chip_peak_flops(device=None) -> float:
    """Best-effort peak bf16 FLOP/s of ``device`` (default: first device).
    Returns 0.0 when the chip is unknown (e.g. CPU) — callers should skip
    MFU reporting then."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _CHIP_PEAKS:
        if key in kind:
            return peak
    return 0.0
