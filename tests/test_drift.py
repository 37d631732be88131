"""Online score-drift monitoring (vad_tpu/eval/drift.py) + its serving
integration: /v1/metrics score sections, Prometheus gauges, webhook
drift alerts, hot-reload recalibration."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from vad_tpu.eval.drift import ScoreWindow, score_baseline


# --------------------------------------------------------------- unit


def test_ring_exceed_count_matches_bruteforce_across_wraps():
    """The O(1)-maintained exceedance count must equal a brute-force
    recount of the live window at every step, including wraparounds and
    chunks that straddle the ring edge."""
    rng = np.random.default_rng(0)
    w = ScoreWindow(window=37, threshold=0.5)
    kept = []
    for _ in range(200):
        chunk = rng.uniform(0, 1, size=int(rng.integers(1, 9)))
        w.observe(chunk)
        kept.extend(chunk.tolist())
        kept = kept[-37:]
        assert w.exceed_rate() == pytest.approx(
            np.mean(np.asarray(kept) > 0.5)
        )


def test_oversize_chunk_keeps_only_last_window():
    w = ScoreWindow(window=8, threshold=0.0)
    w.observe(np.arange(-20.0, 0.0))  # 20 scores into an 8-window
    snap = w.snapshot()
    assert snap["count"] == 8
    assert snap["total_observed"] == 20
    assert snap["p50"] == pytest.approx(np.quantile(np.arange(-8.0, 0.0), 0.5))


def test_drifting_requires_warm_window_and_factor():
    w = ScoreWindow(window=1000, threshold=1.0, factor=5.0, min_count=100)
    # 50 exceeding scores: rate 1.0 but window too cold to judge
    w.observe(np.full(50, 2.0))
    assert not w.drifting()
    # warm the window with exactly the promised 1% exceedance: no drift
    normal = np.zeros(950)
    normal[:5] = 2.0
    w = ScoreWindow(window=1000, threshold=1.0, factor=5.0, min_count=100)
    w.observe(normal)
    assert not w.drifting()
    assert w.snapshot()["drifting"] is False
    # 6% exceedance >= 5 x 1%: drift
    drifted = np.zeros(1000)
    drifted[:60] = 2.0
    w.observe(drifted)
    assert w.drifting()
    assert w.snapshot()["drifting"] is True


def test_small_window_can_still_reach_verdict():
    """min_count self-caps at the window size: --drift-window 64 must be
    able to warm up and fire, not be silently verdict-disabled by the
    256 default."""
    w = ScoreWindow(window=64, threshold=1.0, factor=5.0)
    assert w.min_count == 64
    w.observe(np.full(64, 2.0))
    assert w.drifting()


def test_predict_objective_baseline_is_gated():
    """A predict-objective video checkpoint's baseline is on the predict
    score scale; serving emits reconstruction error — the drift monitor
    must not anchor to it (same gate as serving_frame_threshold)."""
    from vad_tpu.eval.metrics import serving_score_baseline

    base = {"p50": 0.5, "p99": 0.7}
    ckpt = {"model_type": "video", "args": {"objective": "predict"},
            "score_baseline": base}
    assert serving_score_baseline(ckpt) is None
    ckpt["args"]["objective"] = "reconstruct"
    assert serving_score_baseline(ckpt) == base
    # image checkpoints have no objective split
    assert serving_score_baseline(
        {"model_type": "image", "score_baseline": base}
    ) == base


def test_notify_lazy_payload_skipped_under_cooldown():
    """A callable payload must not be BUILT when the cooldown swallows
    the alert — that is what keeps snapshot() off the scoring path
    during sustained drift."""
    from vad_tpu.eval.alerts import AlertNotifier

    n = AlertNotifier("http://127.0.0.1:1/unused", cooldown=3600.0)
    calls = []

    def payload():
        calls.append(1)
        return {"type": "score_drift"}

    try:
        assert n.notify(payload, source="x") is True
        assert n.notify(payload, source="x") is False  # cooldown closed
        assert len(calls) == 1
    finally:
        n.close()


def test_no_threshold_means_no_verdict():
    w = ScoreWindow(window=16)
    w.observe([5.0] * 16)
    assert w.exceed_rate() is None
    assert not w.drifting()
    snap = w.snapshot()
    assert "exceed_rate" not in snap and "drifting" not in snap
    assert snap["mean"] == 5.0


def test_recalibrate_rebuilds_exceedances_and_baseline_shift():
    w = ScoreWindow(window=100, threshold=10.0)
    w.observe(np.linspace(0.0, 1.0, 100))
    assert w.exceed_rate() == 0.0
    base = score_baseline(np.linspace(0.0, 1.0, 1000))
    w.recalibrate(0.5, base)  # new threshold: half the window exceeds
    assert w.exceed_rate() == pytest.approx(0.5, abs=0.02)
    snap = w.snapshot()
    # same distribution as the baseline: median shift ~ 0
    assert abs(snap["p50_shift"]) < 0.05
    # shifted traffic moves the indicator by (shift / (p99-p50)) ~ 2x
    w.observe(np.linspace(0.0, 1.0, 100) + 1.0)
    assert w.snapshot()["p50_shift"] == pytest.approx(
        1.0 / (base["p99"] - base["p50"]), rel=0.1
    )


def test_downward_drift_visible_without_exceedances():
    """A stuck all-black camera scores near zero: no threshold
    exceedances, but the median-shift indicator goes strongly negative —
    the failure mode exceedance-rate monitoring is blind to."""
    base = score_baseline(np.random.default_rng(1).uniform(0.4, 0.6, 5000))
    w = ScoreWindow(window=256, threshold=base["p99"], baseline=base)
    w.observe(np.full(256, 1e-4))
    snap = w.snapshot()
    assert snap["exceed_rate"] == 0.0
    assert snap["p50_shift"] < -1.0


def test_score_baseline_fields_and_empty():
    assert score_baseline([]) is None
    b = score_baseline([1.0, 2.0, 3.0, 4.0])
    assert b["count"] == 4
    assert b["p50"] == pytest.approx(2.5)
    assert set(b) == {"count", "mean", "std", "p50", "p90", "p99"}


def test_threadsafe_concurrent_observe():
    w = ScoreWindow(window=512, threshold=0.5)
    errs = []

    def feed(seed):
        try:
            rng = np.random.default_rng(seed)
            for _ in range(200):
                w.observe(rng.uniform(0, 1, 7))
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    threads = [threading.Thread(target=feed, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    snap = w.snapshot()
    assert snap["count"] == 512
    assert snap["total_observed"] == 4 * 200 * 7
    # count invariant survived the races (snapshot rounds to 6 digits)
    assert snap["exceed_rate"] == pytest.approx(
        np.mean(w._buf > 0.5), abs=1e-6
    )
    assert w._exceed_in_window == int(np.sum(w._buf > 0.5))


# --------------------------------------------------- serving integration


class _AlertSink(BaseHTTPRequestHandler):
    received = []

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        type(self).received.append(json.loads(self.rfile.read(n)))
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def log_message(self, *a):
        pass


def test_video_service_drift_alert_and_metrics(tmp_path):
    """End to end on the real coalescing service: drifted traffic shows
    up in metrics_snapshot()['scores'] and fires ONE score_drift webhook
    (cooldown suppresses repeats)."""
    import jax

    from vad_tpu.eval.alerts import AlertNotifier
    from vad_tpu.eval.http_server import ScoringService
    from vad_tpu.eval.serving import MultiStreamScorer
    from vad_tpu.models.video_autoencoder import VideoAutoencoder

    model = VideoAutoencoder(backend="xla")
    variables = model.init(
        jax.random.key(0), np.zeros((1, 2, 64, 64, 3), np.float32), train=False
    )
    scorer = MultiStreamScorer(model, variables, num_slots=2, chunk=4,
                               image_size=64)
    svc = ScoringService(scorer, drift_window=64)
    sink = HTTPServer(("127.0.0.1", 0), _AlertSink)
    _AlertSink.received = []
    threading.Thread(target=sink.serve_forever, daemon=True).start()
    notifier = AlertNotifier(f"http://127.0.0.1:{sink.server_address[1]}",
                             consecutive=1000)  # streak alerts never fire
    try:
        # a threshold every reconstruction of random noise will exceed
        svc.drift.recalibrate(1e-12, None)
        svc.drift.min_count = 8
        svc.score_threshold = None  # isolate: no per-stream streak path
        svc.notifier = notifier
        svc.attach(0)
        rng = np.random.default_rng(0)
        for _ in range(4):
            frames = rng.integers(0, 255, (4, 64, 64, 3), np.uint8)
            svc.submit(0, frames).result(timeout=120)
        snap = svc.metrics_snapshot()
        scores = snap["scores"]
        assert scores["count"] == 16
        assert scores["exceed_rate"] == 1.0
        assert scores["drifting"] is True
        assert scores["threshold"] == 1e-12
        import time

        deadline = time.time() + 10
        while not _AlertSink.received and time.time() < deadline:
            time.sleep(0.05)
        drift_alerts = [a for a in _AlertSink.received
                        if a["type"] == "score_drift"]
        assert len(drift_alerts) == 1  # cooldown collapsed the repeats
        assert drift_alerts[0]["drifting"] is True
    finally:
        svc.close()
        notifier.close()
        sink.shutdown()


def test_image_service_metrics_and_prometheus(tmp_path):
    import jax

    from vad_tpu.eval.http_server import ImageScoringService, prometheus_text
    from vad_tpu.models.autoencoder import ConvAutoencoder

    model = ConvAutoencoder()
    variables = model.init(
        jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32), train=False
    )
    svc = ImageScoringService(model, variables, image_size=64, batch=4,
                              drift_window=32)
    svc.drift.recalibrate(1e-12, {"count": 10, "mean": 0.5, "std": 0.1,
                                  "p50": 0.5, "p90": 0.6, "p99": 0.7})
    svc.drift.min_count = 4
    frames = np.random.default_rng(0).integers(0, 255, (6, 64, 64, 3), np.uint8)
    svc.score_images(frames)
    snap = svc.metrics_snapshot()
    assert snap["scores"]["count"] == 6
    assert snap["scores"]["drifting"] is True
    assert "p50_shift" in snap["scores"]
    text = prometheus_text({"image": snap})
    assert 'vad_score_exceed_rate{model="image"} 1.0' in text
    assert 'vad_score_drifting{model="image"} 1' in text
    assert 'vad_score_window_p99{model="image"}' in text


def test_image_service_drift_fires_webhook():
    """The stateless image service pages on drift too (no stream
    streaks, but the distribution contract is model-agnostic)."""
    import jax

    from vad_tpu.eval.http_server import ImageScoringService
    from vad_tpu.models.autoencoder import ConvAutoencoder

    model = ConvAutoencoder()
    variables = model.init(
        jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32), train=False
    )
    svc = ImageScoringService(model, variables, image_size=64, batch=4,
                              drift_window=8)
    svc.drift.recalibrate(1e-12, None)

    sent = []

    class FakeNotifier:
        delivered = 0
        failed = 0

        def notify(self, payload, source, cooldown=None):
            sent.append(payload() if callable(payload) else payload)
            return True

    svc.notifier = FakeNotifier()
    frames = np.random.default_rng(0).integers(0, 255, (8, 64, 64, 3), np.uint8)
    svc.score_images(frames)
    assert sent and sent[0]["type"] == "score_drift"
    assert sent[0]["model"] == "image"
    assert sent[0]["drifting"] is True
    assert svc.metrics_snapshot()["alerts"] == {"delivered": 0, "failed": 0}


def test_drift_window_zero_disables():
    import jax

    from vad_tpu.eval.http_server import ImageScoringService
    from vad_tpu.models.autoencoder import ConvAutoencoder

    model = ConvAutoencoder()
    variables = model.init(
        jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32), train=False
    )
    svc = ImageScoringService(model, variables, image_size=64, batch=2,
                              drift_window=0)
    assert svc.drift is None
    svc.score_images(np.zeros((2, 64, 64, 3), np.uint8))
    assert "scores" not in svc.metrics_snapshot()
