"""Tracing, timing, and metrics observability.

The reference has no profiling or structured logging at all (SURVEY §5.1:
tqdm bars and print()).  This module provides the TPU-native equivalents:

- `trace(logdir)`: jax.profiler trace context (view in Perfetto /
  TensorBoard's profile plugin);
- `StepTimer`: wall-clock step timing with percentile summary — the
  device-sync caveat is on the caller (time after a real host fetch);
- `MetricsLogger`: append-only JSONL metrics stream per run dir
  (machine-readable training history next to the checkpoints), with an
  optional TensorBoard tee (`tensorboard=True`);
- `TensorBoardWriter`: scalar event-file writer over tensorboard's own
  EventFileWriter — the reference ships tensorboard in requirements.txt:9
  but never imports it; here `--tensorboard` makes every epoch metric a
  live TB scalar without importing torch;
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


def device_memory_report() -> Optional[Dict[str, float]]:
    """Live HBM usage of device 0 from the runtime allocator, in GiB.

    Peak is the number that matters operationally: it is what decides
    whether a batch/sequence/resolution fits the chip (the reference's
    answer was a README tip to shrink the batch by hand).  Returns None
    on backends that expose no memory_stats (CPU, some emulators) —
    callers print nothing rather than zeros.
    """
    gib = 1024**3
    dev = jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        # allocator stats unavailable (CPU backend, or a remote/tunneled
        # TPU plugin that doesn't forward them): fall back to accounting
        # the LIVE jax arrays — params, opt state, carried stream state,
        # prefetched batches.  No peak and no XLA workspace, but it is
        # the resident-state number an operator can act on.
        try:
            live = sum(a.nbytes for a in jax.live_arrays())
        except Exception:
            return None
        return {"live_arrays_gib": round(live / gib, 3)} if live else None
    out = {}
    for src, dst in (
        ("bytes_in_use", "in_use_gib"),
        ("peak_bytes_in_use", "peak_gib"),
        ("bytes_limit", "limit_gib"),
    ):
        if src in stats:
            out[dst] = round(stats[src] / gib, 3)
    return out or None


def format_memory_report(mem: Optional[Dict[str, float]]) -> Optional[str]:
    """One human line from device_memory_report(), or None."""
    if not mem:
        return None
    parts = []
    if "peak_gib" in mem:
        parts.append(f"peak {mem['peak_gib']:.2f} GiB")
    if "in_use_gib" in mem:
        parts.append(f"in use {mem['in_use_gib']:.2f} GiB")
    if "limit_gib" in mem:
        parts.append(f"limit {mem['limit_gib']:.2f} GiB")
    if "live_arrays_gib" in mem:
        parts.append(
            f"live arrays {mem['live_arrays_gib']:.2f} GiB "
            "(allocator stats unavailable)"
        )
    return "HBM: " + ", ".join(parts) if parts else None


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


class TensorBoardWriter:
    """Scalar-only TensorBoard event writer.

    Uses tensorboard's EventFileWriter + summary protos directly rather
    than torch.utils.tensorboard (no torch import on the training path).
    If the tensorboard package is absent the writer degrades to a no-op
    after one warning — training never depends on it.
    """

    def __init__(self, logdir: str | Path) -> None:
        self._writer = None
        self._event_pb2 = None
        self._summary_pb2 = None
        try:
            from tensorboard.compat.proto import event_pb2, summary_pb2
            from tensorboard.summary.writer.event_file_writer import (
                EventFileWriter,
            )
        except Exception as exc:  # pragma: no cover - env without tensorboard
            print(f"TensorBoard unavailable ({exc}); scalar logging disabled")
            return
        Path(logdir).mkdir(parents=True, exist_ok=True)
        self._writer = EventFileWriter(str(logdir))
        self._event_pb2 = event_pb2
        self._summary_pb2 = summary_pb2

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is None:
            return
        summary = self._summary_pb2.Summary(
            value=[self._summary_pb2.Summary.Value(tag=tag, simple_value=float(value))]
        )
        self._writer.add_event(
            self._event_pb2.Event(wall_time=time.time(), step=int(step), summary=summary)
        )

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
            self._writer = None


class MetricsLogger:
    """Append-only JSONL metrics next to the run's checkpoints.

    With ``tensorboard=True`` every numeric metric is also written as a
    TB scalar under ``<run_dir>/tb/`` (flushed per log call, so a live
    ``tensorboard --logdir results/`` follows training as it runs).
    """

    def __init__(
        self,
        run_dir: str | Path,
        filename: str = "metrics.jsonl",
        tensorboard: bool = False,
    ) -> None:
        self.path = Path(run_dir) / filename
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.tb: Optional[TensorBoardWriter] = (
            TensorBoardWriter(Path(run_dir) / "tb") if tensorboard else None
        )

    def log(self, step: int, **metrics) -> None:
        record = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            record[k] = float(v) if isinstance(v, (int, float, np.floating)) else v
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.tb is not None:
            for k, v in record.items():
                if k in ("step", "time"):
                    continue
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    self.tb.scalar(k, v, step)
            self.tb.flush()

    def read(self) -> List[Dict]:
        if not self.path.exists():
            return []
        return [json.loads(line) for line in self.path.read_text().splitlines() if line]
