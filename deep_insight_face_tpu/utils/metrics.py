"""Metrics logging + wall-clock tracing.

Replaces the reference's TensorBoard callbacks and ``tf.print`` loss
telemetry (reference: training/siamese.py:47, common/losses.py:72-80,
SURVEY §5) with a dependency-free JSONL scalar log (one object per step,
trivially plottable) and a timing context manager built on
time.perf_counter + optional jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


class MetricsLogger:
    """Append-only JSONL scalar logger with in-memory history."""

    def __init__(self, log_dir: Optional[str] = None, name: str = "train"):
        self.history: List[Dict[str, float]] = []
        self._fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.path = os.path.join(log_dir, f"{name}.jsonl")
            self._fh = open(self.path, "a", buffering=1)

    def log(self, step: int, metrics: Dict[str, Any]) -> Dict[str, float]:
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(np.asarray(v))
            except (TypeError, ValueError):
                continue
        self.history.append(row)
        if self._fh:
            self._fh.write(json.dumps(row) + "\n")
        return row

    def scalars(self, key: str) -> List[float]:
        return [r[key] for r in self.history if key in r]

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


@contextlib.contextmanager
def timed(label: str, sink: Optional[Dict[str, float]] = None) -> Iterator[None]:
    """Wall-clock timer (the working version of the reference's @timing
    decorator, scripts/insight_face.py:19-28)."""
    start = time.perf_counter()
    yield
    elapsed = time.perf_counter() - start
    if sink is not None:
        sink[label] = elapsed


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context (viewable in TensorBoard / Perfetto)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
