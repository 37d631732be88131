"""Webhook alerting: streak counting, cooldown, delivery, daemon wiring."""

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vad_tpu.eval.alerts import AlertNotifier

SIZE, CHUNK = 64, 4


@pytest.fixture()
def webhook():
    """Tiny local receiver capturing every alert POST body."""
    received = []
    event = threading.Event()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            received.append(json.loads(self.rfile.read(n)))
            event.set()
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"ok")

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield {"url": f"http://127.0.0.1:{httpd.server_address[1]}/hook",
           "received": received, "event": event}
    httpd.shutdown()
    httpd.server_close()


def _wait_for(received, n, timeout=10.0):
    deadline = time.time() + timeout
    while len(received) < n and time.time() < deadline:
        time.sleep(0.02)
    return len(received)


class TestAlertNotifier:
    def test_consecutive_streak_then_alert(self, webhook):
        n = AlertNotifier(webhook["url"], consecutive=3, cooldown=1000.0)
        try:
            hot = np.full(CHUNK, 0.9)
            n.observe(0, hot, 0.5)
            n.observe(0, hot, 0.5)
            assert _wait_for(webhook["received"], 1, timeout=0.5) == 0  # streak 2 < 3
            n.observe(0, hot, 0.5)
            assert _wait_for(webhook["received"], 1) == 1
            alert = webhook["received"][0]
            assert alert["type"] == "stream_anomaly"
            assert alert["slot"] == 0
            assert alert["consecutive_chunks"] == 3
            assert alert["frames_flagged"] == CHUNK
            assert alert["threshold"] == 0.5
            assert alert["max_score"] == pytest.approx(0.9)
            assert n.delivered == 1
        finally:
            n.close()

    def test_clean_chunk_resets_streak(self, webhook):
        n = AlertNotifier(webhook["url"], consecutive=2, cooldown=1000.0)
        try:
            hot, cold = np.full(CHUNK, 0.9), np.full(CHUNK, 0.1)
            n.observe(0, hot, 0.5)
            n.observe(0, cold, 0.5)  # resets
            n.observe(0, hot, 0.5)
            assert _wait_for(webhook["received"], 1, timeout=0.5) == 0
            n.observe(0, hot, 0.5)  # streak reaches 2 again
            assert _wait_for(webhook["received"], 1) == 1
        finally:
            n.close()

    def test_cooldown_suppresses_repeats_and_slots_are_independent(self, webhook):
        n = AlertNotifier(webhook["url"], consecutive=1, cooldown=1000.0)
        try:
            hot = np.full(CHUNK, 0.9)
            n.observe(0, hot, 0.5)
            assert _wait_for(webhook["received"], 1) == 1
            n.observe(0, hot, 0.5)  # cooldown: suppressed
            n.observe(1, hot, 0.5)  # different slot: fires
            assert _wait_for(webhook["received"], 2) == 2
            assert {a["slot"] for a in webhook["received"]} == {0, 1}
            # reset clears the cooldown (detach + reattach case)
            n.reset(0)
            n.observe(0, hot, 0.5)
            assert _wait_for(webhook["received"], 3) == 3
        finally:
            n.close()

    def test_no_threshold_means_no_alerts(self, webhook):
        n = AlertNotifier(webhook["url"], consecutive=1)
        try:
            n.observe(0, np.full(CHUNK, 0.9), None)
            assert _wait_for(webhook["received"], 1, timeout=0.3) == 0
        finally:
            n.close()

    def test_delivery_failure_never_raises(self):
        n = AlertNotifier("http://127.0.0.1:9/nothing-listens-here",
                          consecutive=1, timeout=0.5)
        try:
            n.observe(0, np.full(CHUNK, 0.9), 0.5)
            deadline = time.time() + 10
            while n.failed == 0 and time.time() < deadline:
                time.sleep(0.02)
            assert n.failed == 1 and n.delivered == 0
        finally:
            n.close()


def test_daemon_fires_webhook_end_to_end(webhook):
    """Full path: frames POSTed to the daemon -> coalesced scoring ->
    threshold flags -> webhook alert with the stream's slot id."""
    from vad_tpu.eval.http_server import ScoringServer, ScoringService
    from vad_tpu.eval.serving import MultiStreamScorer
    from vad_tpu.models.video_autoencoder import VideoAutoencoder

    model = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, SIZE, SIZE, 3)), train=False)
    service = ScoringService(MultiStreamScorer(model, variables, 2, CHUNK, SIZE))
    service.score_threshold = 1e-9  # untrained recon error clears this
    service.notifier = AlertNotifier(webhook["url"], consecutive=2, cooldown=1000.0)
    srv = ScoringServer(host="127.0.0.1", port=0, service=service)
    srv.start_background()
    try:
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=120)
        conn.request("POST", "/v1/streams")
        slot = json.loads(conn.getresponse().read())["slot"]
        frames = np.random.default_rng(0).integers(
            0, 255, size=(CHUNK, SIZE, SIZE, 3), dtype=np.uint8
        )
        for _ in range(2):  # two consecutive anomalous chunks
            conn.request(
                "POST", f"/v1/streams/{slot}/frames", body=frames.tobytes(),
                headers={"X-Frames-Shape": ",".join(map(str, frames.shape))},
            )
            resp = conn.getresponse()
            resp.read()  # drain the keep-alive connection for the next request
            assert resp.status == 200
        assert _wait_for(webhook["received"], 1) == 1
        assert webhook["received"][0]["slot"] == slot
        # delivery counters surface in /v1/metrics
        conn.request("GET", "/v1/metrics")
        m = json.loads(conn.getresponse().read())
        assert m["alerts"]["delivered"] == 1 and m["alerts"]["failed"] == 0
        conn.close()
    finally:
        service.notifier.close()
        srv.close()
