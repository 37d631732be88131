"""HTTP scoring daemon: protocol, coalescing, parity with direct scoring."""

import http.client
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vad_tpu.eval.http_server import ScoringServer
from vad_tpu.eval.serving import MultiStreamScorer
from vad_tpu.models.video_autoencoder import VideoAutoencoder

SIZE, SLOTS, CHUNK = 64, 3, 4


@pytest.fixture(scope="module")
def server():
    model = VideoAutoencoder()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, SIZE, SIZE, 3)), train=False)
    scorer = MultiStreamScorer(model, variables, SLOTS, CHUNK, SIZE)
    srv = ScoringServer(scorer, host="127.0.0.1", port=0)
    srv.start_background()
    yield srv
    srv.close()


def _req(server, method, path, body=None, headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
    conn.request(method, path, body=body, headers=headers or {})
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    return resp.status, payload


def _post_frames(server, slot, frames):
    return _req(
        server, "POST", f"/v1/streams/{slot}/frames", body=frames.tobytes(),
        headers={"X-Frames-Shape": ",".join(map(str, frames.shape))},
    )


def test_health_attach_score_detach(server):
    status, health = _req(server, "GET", "/v1/health")
    assert status == 200 and health["num_slots"] == SLOTS

    status, r = _req(server, "POST", "/v1/streams")
    assert status == 200
    slot = r["slot"]

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(CHUNK, SIZE, SIZE, 3), dtype=np.uint8)
    status, r = _post_frames(server, slot, frames)
    assert status == 200
    assert len(r["scores"]) == CHUNK
    assert all(np.isfinite(r["scores"]))

    status, r = _req(server, "DELETE", f"/v1/streams/{slot}")
    assert status == 200 and r["detached"] == slot


def test_scores_match_direct_scorer(server):
    """Server scores == a fresh identical scorer fed the same frames."""
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, size=(CHUNK, SIZE, SIZE, 3), dtype=np.uint8)

    model = VideoAutoencoder()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, SIZE, SIZE, 3)), train=False)
    ref = MultiStreamScorer(model, variables, SLOTS, CHUNK, SIZE)
    rslot = ref.attach()
    batch = np.zeros((SLOTS, CHUNK, SIZE, SIZE, 3), np.uint8)
    batch[rslot] = frames
    want = ref.score_chunk(batch)[rslot]

    _, r = _req(server, "POST", "/v1/streams")
    slot = r["slot"]
    _, out = _post_frames(server, slot, frames)
    _req(server, "DELETE", f"/v1/streams/{slot}")
    np.testing.assert_allclose(out["scores"], want, rtol=1e-5, atol=1e-6)


def test_concurrent_streams_coalesce(server):
    rng = np.random.default_rng(2)
    slots = [json.loads(json.dumps(_req(server, "POST", "/v1/streams")[1]))["slot"]
             for _ in range(2)]
    frames = {s: rng.integers(0, 255, size=(CHUNK, SIZE, SIZE, 3), dtype=np.uint8)
              for s in slots}
    results = {}

    def worker(s):
        results[s] = _post_frames(server, s, frames[s])

    threads = [threading.Thread(target=worker, args=(s,)) for s in slots]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for s in slots:
        status, r = results[s]
        assert status == 200 and len(r["scores"]) == CHUNK
        _req(server, "DELETE", f"/v1/streams/{s}")


def test_error_paths(server):
    status, r = _post_frames(server, 0, np.zeros((CHUNK, SIZE, SIZE, 3), np.uint8))
    assert status == 400  # not attached
    _, a = _req(server, "POST", "/v1/streams")
    status, r = _post_frames(
        server, a["slot"], np.zeros((CHUNK + 1, SIZE, SIZE, 3), np.uint8)
    )
    assert status == 400  # wrong shape
    _req(server, "DELETE", f"/v1/streams/{a['slot']}")
