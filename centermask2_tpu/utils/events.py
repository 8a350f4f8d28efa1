"""Training metrics storage — the detectron2 EventStorage analog.

The reference logs scalar training signals through EventStorage
(center_heads.py:255-258 fg/bg counts, mask_head.py:140-143 mask
accuracy/FP/FN, keypoint_head.py:68-71 skipped batches). This keeps the
same put_scalar/latest API and persists one JSON line per step —
machine-readable where the reference's was TensorBoard-bound.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class EventStorage:
    def __init__(self, output_file: Optional[str] = None, start_iter: int = 0):
        self._iter = start_iter
        self._history = defaultdict(list)
        self._latest: Dict[str, float] = {}
        self._file = None
        if output_file:
            os.makedirs(os.path.dirname(os.path.abspath(output_file)),
                        exist_ok=True)
            self._file = open(output_file, "a")

    @property
    def iter(self) -> int:
        return self._iter

    def put_scalar(self, name: str, value, smoothing_hint: bool = True) -> None:
        v = float(value)
        self._history[name].append((self._iter, v))
        self._latest[name] = v

    def put_scalars(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.put_scalar(k, v)

    def latest(self) -> Dict[str, float]:
        return dict(self._latest)

    def history(self, name: str):
        return list(self._history[name])

    def median(self, name: str, window: int = 20) -> float:
        vals = [v for _, v in self._history[name][-window:]]
        vals.sort()
        return vals[len(vals) // 2] if vals else float("nan")

    def step(self) -> None:
        if self._file is not None and self._latest:
            rec = {"iteration": self._iter, "time": time.time()}
            rec.update(self._latest)
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        self._iter += 1
        self._latest = {}

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None
