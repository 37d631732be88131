"""Observability utilities tests."""

import json
import time

import numpy as np

from vad_tpu.utils.profiling import MetricsLogger, StepTimer


def test_step_timer_summary():
    t = StepTimer()
    for _ in range(5):
        with t.step():
            time.sleep(0.002)
    s = t.summary()
    assert s["count"] == 5
    assert s["mean_s"] >= 0.002
    assert s["p95_s"] >= s["p50_s"] >= 0.0


def test_metrics_logger_roundtrip(tmp_path):
    m = MetricsLogger(tmp_path)
    m.log(1, loss=0.5, separation=np.float32(1.25), note="warmup")
    m.log(2, loss=0.25)
    records = m.read()
    assert [r["step"] for r in records] == [1, 2]
    assert records[0]["loss"] == 0.5
    assert records[0]["separation"] == 1.25
    assert records[0]["note"] == "warmup"
    # file is plain JSONL
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    assert all(json.loads(line) for line in lines)


def test_metrics_logger_tensorboard_tee(tmp_path):
    """tensorboard=True tees numeric metrics into <run_dir>/tb/ as TB
    scalars readable by the stock EventAccumulator; strings are skipped."""
    import pytest

    pytest.importorskip("tensorboard")
    m = MetricsLogger(tmp_path, tensorboard=True)
    m.log(1, loss=0.5, separation=np.float32(1.25), note="warmup")
    m.log(2, loss=0.25)
    m.tb.close()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path / "tb"))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert tags == {"loss", "separation"}
    losses = [(e.step, e.value) for e in acc.Scalars("loss")]
    assert losses == [(1, 0.5), (2, 0.25)]
    # JSONL stream is unaffected by the tee
    assert [r["step"] for r in m.read()] == [1, 2]


def test_metrics_logger_no_tb_dir_without_flag(tmp_path):
    m = MetricsLogger(tmp_path)
    m.log(1, loss=0.5)
    assert m.tb is None
    assert not (tmp_path / "tb").exists()


def test_metrics_logger_empty_read(tmp_path):
    assert MetricsLogger(tmp_path / "sub").read() == []


def test_device_memory_report_shape():
    """On CPU the backend may or may not expose memory_stats; either way
    the report is None or a dict of GiB floats and the formatter matches."""
    from vad_tpu.utils.profiling import device_memory_report, format_memory_report

    mem = device_memory_report()
    if mem is None:
        assert format_memory_report(mem) is None
    else:
        assert all(isinstance(v, float) and v >= 0 for v in mem.values())
        assert set(mem) <= {"in_use_gib", "peak_gib", "limit_gib", "live_arrays_gib"}
        assert format_memory_report(mem).startswith("HBM: ")


def test_format_memory_report_line():
    from vad_tpu.utils.profiling import format_memory_report

    line = format_memory_report(
        {"peak_gib": 1.25, "in_use_gib": 0.5, "limit_gib": 15.5}
    )
    assert line == "HBM: peak 1.25 GiB, in use 0.50 GiB, limit 15.50 GiB"
    assert format_memory_report({}) is None
    assert format_memory_report(None) is None
