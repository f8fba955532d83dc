"""Structured metric logging.

The reference's observability is print statements + pickled result tables
(SURVEY.md §5.5). Here: a JSONL metric stream (one object per step/epoch,
machine-readable) plus the reference-compatible pickle table writer in
evaluate.evaluator.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, **metrics: Any) -> Dict[str, Any]:
        rec = {"t": round(time.time() - self._t0, 3)}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
        if self.echo:
            print(line, file=sys.stderr)
        return rec

    def close(self):
        if self._fh:
            self._fh.close()


class StepTimer:
    """Wall-clock step timing with warmup skip (first step = compile)."""

    def __init__(self, skip: int = 1):
        self.skip = skip
        self.times = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._last
        if self.skip > 0:
            self.skip -= 1
        else:
            self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
