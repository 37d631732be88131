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


def test_metrics_logger_empty_read(tmp_path):
    assert MetricsLogger(tmp_path / "sub").read() == []
