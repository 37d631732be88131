"""Tracing, timing, and metrics observability.

The reference has no profiling or structured logging at all (SURVEY §5.1:
tqdm bars and print()).  This module provides the TPU-native equivalents:

- `trace(logdir)`: jax.profiler trace context (view in Perfetto /
  TensorBoard's profile plugin);
- `StepTimer`: wall-clock step timing with percentile summary — the
  device-sync caveat is on the caller (time after a real host fetch);
- `MetricsLogger`: append-only JSONL metrics stream per run dir
  (machine-readable training history next to the checkpoints);
- `enable_nan_debugging()`: flips jax_debug_nans so the first NaN raises
  with a traceback into the offending op.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str | Path) -> Iterator[None]:
    """Capture a device trace for the enclosed block."""
    logdir = str(logdir)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Collects per-step wall times; summarizes mean/p50/p95."""

    def __init__(self) -> None:
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None, "start() first"
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self._t0 = None
        return dt

    @contextlib.contextmanager
    def step(self) -> Iterator[None]:
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"count": 0}
        arr = np.asarray(self.times)
        return {
            "count": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "total_s": float(arr.sum()),
        }


class MetricsLogger:
    """Append-only JSONL metrics next to the run's checkpoints."""

    def __init__(self, run_dir: str | Path, filename: str = "metrics.jsonl") -> None:
        self.path = Path(run_dir) / filename
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, step: int, **metrics) -> None:
        record = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            record[k] = float(v) if isinstance(v, (int, float, np.floating)) else v
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def read(self) -> List[Dict]:
        if not self.path.exists():
            return []
        return [json.loads(line) for line in self.path.read_text().splitlines() if line]
