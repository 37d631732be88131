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
def server(tmp_path_factory):
    model = VideoAutoencoder()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, SIZE, SIZE, 3)), train=False)
    scorer = MultiStreamScorer(model, variables, SLOTS, CHUNK, SIZE)
    # reload root = the pytest basetemp so tests can reload checkpoints
    # they write under tmp_path (production derives roots from the served
    # checkpoints' run dirs — see test_reload_path_restriction)
    srv = ScoringServer(scorer, host="127.0.0.1", port=0,
                        reload_roots=[tmp_path_factory.getbasetemp()])
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
    status, _ = _post_frames(server, 999, np.zeros((CHUNK, SIZE, SIZE, 3), np.uint8))
    assert status == 400  # out of range -> 400, not a dropped connection
    status, _ = _post_frames(server, -1, np.zeros((CHUNK, SIZE, SIZE, 3), np.uint8))
    assert status == 400  # negative must not wrap to the last slot
    status, _ = _req(server, "DELETE", "/v1/streams/999")
    assert status == 400
    status, _ = _req(server, "DELETE", "/v1/streams/abc")
    assert status == 400
    _req(server, "DELETE", f"/v1/streams/{a['slot']}")


def test_image_model_serving():
    """Image checkpoints serve statelessly through /v1/images."""
    from vad_tpu.eval.http_server import ImageScoringService, ScoringServer
    from vad_tpu.models.autoencoder import ConvAutoencoder

    model = ConvAutoencoder(latent_dim=64)
    variables = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    service = ImageScoringService(model, variables, SIZE, batch=4, dtype=jnp.float32)
    srv = ScoringServer(service=service, host="127.0.0.1", port=0)
    srv.start_background()
    try:
        status, h = _req(srv, "GET", "/v1/health")
        assert status == 200 and h["model_type"] == "image"
        rng = np.random.default_rng(5)
        imgs = rng.integers(0, 255, size=(3, SIZE, SIZE, 3), dtype=np.uint8)
        status, r = _req(srv, "POST", "/v1/images", body=imgs.tobytes(),
                         headers={"X-Frames-Shape": f"3,{SIZE},{SIZE},3"})
        assert status == 200 and len(r["scores"]) == 3
        # parity with a direct apply
        x = jnp.asarray(imgs, jnp.float32) / 127.5 - 1.0
        want = model.apply(variables, x, method=ConvAutoencoder.reconstruction_error)
        np.testing.assert_allclose(r["scores"], np.asarray(want), rtol=1e-4, atol=1e-6)
        # video endpoints rejected in image mode
        status, _ = _req(srv, "POST", "/v1/streams")
        assert status == 400
        # over-capacity request (2.5x the compiled batch of 4) is chunked
        # into three padded device steps server-side, not rejected
        big = rng.integers(0, 255, size=(10, SIZE, SIZE, 3), dtype=np.uint8)
        status, r = _req(srv, "POST", "/v1/images", body=big.tobytes(),
                         headers={"X-Frames-Shape": f"10,{SIZE},{SIZE},3"})
        assert status == 200 and len(r["scores"]) == 10
        xb = jnp.asarray(big, jnp.float32) / 127.5 - 1.0
        want_big = model.apply(variables, xb, method=ConvAutoencoder.reconstruction_error)
        np.testing.assert_allclose(r["scores"], np.asarray(want_big), rtol=1e-4, atol=1e-6)
        # empty batch still a client error
        status, _ = _req(srv, "POST", "/v1/images", body=b"",
                         headers={"X-Frames-Shape": f"0,{SIZE},{SIZE},3"})
        assert status == 400
        # beyond the per-request cap: rejected BEFORE the body is
        # buffered (413), no matter how large the declared shape
        huge_n = 4 * service.MAX_STEPS_PER_REQUEST + 1
        status, r = _req(srv, "POST", "/v1/images", body=b"",
                         headers={"X-Frames-Shape": f"{huge_n},{SIZE},{SIZE},3"})
        assert status == 413 and "limit" in r["error"]
        # content-length / shape mismatch is a 400, not a crash
        status, _ = _req(srv, "POST", "/v1/images", body=b"abc",
                         headers={"X-Frames-Shape": f"2,{SIZE},{SIZE},3"})
        assert status == 400
    finally:
        srv.close()


def test_latent_scorer_serving(tmp_path):
    """serve.py --latent-stats: /v1/images scores through the Mahalanobis
    latent-distance path (eval/latent_score.py), health names the active
    scorer, and hot reload demands new statistics fitted on the new
    weights (refusing a weights-only reload that would silently serve
    stale statistics)."""
    from vad_tpu.eval.http_server import ImageScoringService, ScoringServer
    from vad_tpu.eval.latent_score import (
        fit_latent_stats,
        make_distance_fn,
        save_stats,
        stats_state,
    )
    from vad_tpu.models.autoencoder import ConvAutoencoder
    from vad_tpu.utils.checkpoint import save_checkpoint

    model = ConvAutoencoder(latent_dim=64)
    variables = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False)

    def pyramid_fn(v, x):
        return model.apply(v, x, method=ConvAutoencoder.feature_pyramid)

    rng = np.random.default_rng(7)
    normal_u8 = rng.integers(0, 255, size=(8, SIZE, SIZE, 3), dtype=np.uint8)
    fit_x = normal_u8.astype(np.float32) / 127.5 - 1.0
    stats = fit_latent_stats(
        pyramid_fn, variables, [fit_x[:4], fit_x[4:]], proj_dim=16
    )
    stats_path = tmp_path / "latent_stats.npz"
    save_stats(stats_path, stats)

    service = ImageScoringService(
        model, variables, SIZE, batch=4, dtype=jnp.float32,
        latent_stats=str(stats_path),
    )
    srv = ScoringServer(service=service, host="127.0.0.1", port=0,
                        reload_roots=[tmp_path])
    srv.start_background()
    try:
        status, h = _req(srv, "GET", "/v1/health")
        assert status == 200 and h["scorer"] == "latent"
        assert h["latent"]["grid"] == stats.grid
        assert h["latent"]["dim"] == stats.dim
        assert h["latent"]["n_fit"] == stats.n_fit
        # no calibrated threshold: the checkpoint threshold is a recon
        # quantile, meaningless on the latent-distance scale
        assert h["score_threshold"] is None

        imgs = rng.integers(0, 255, size=(3, SIZE, SIZE, 3), dtype=np.uint8)
        status, r = _req(srv, "POST", "/v1/images", body=imgs.tobytes(),
                         headers={"X-Frames-Shape": f"3,{SIZE},{SIZE},3"})
        assert status == 200 and len(r["scores"]) == 3
        assert "threshold" not in r
        # parity with the eval CLI's definition: mean of the Mahalanobis
        # map from make_distance_fn over the normalized image
        dfn = make_distance_fn(pyramid_fn, stats.layers, stats.grid)
        x = jnp.asarray(imgs, jnp.float32) / 127.5 - 1.0
        maps = dfn(variables, stats_state(stats), x)
        want = np.asarray(jnp.mean(maps.reshape(3, -1), axis=1))
        np.testing.assert_allclose(r["scores"], want, rtol=1e-4, atol=1e-6)

        # weights-only reload refused while the latent scorer is active
        ckpt = tmp_path / "best_model.ckpt"
        save_checkpoint(ckpt, {
            "model_type": "image", "params": variables["params"],
            "batch_stats": variables["batch_stats"],
            "args": {"image_size": SIZE, "latent_dim": 64},
        })
        status, r = _req(srv, "POST", "/v1/reload",
                         body=json.dumps({"checkpoint": str(ckpt)}))
        assert status == 400 and "latent_stats" in r["error"]

        # reload with matching new statistics succeeds and keeps scoring
        status, r = _req(srv, "POST", "/v1/reload", body=json.dumps({
            "checkpoint": str(ckpt), "latent_stats": str(stats_path),
        }))
        assert status == 200 and r["model_type"] == "image"
        status, r = _req(srv, "POST", "/v1/images", body=imgs.tobytes(),
                         headers={"X-Frames-Shape": f"3,{SIZE},{SIZE},3"})
        assert status == 200
        np.testing.assert_allclose(r["scores"], want, rtol=1e-4, atol=1e-6)

        # geometry-mismatched statistics are refused (grid/dim must match
        # the compiled step)
        other = fit_latent_stats(
            pyramid_fn, variables, [fit_x[:4]], proj_dim=8
        )
        other_path = tmp_path / "other_stats.npz"
        save_stats(other_path, other)
        status, r = _req(srv, "POST", "/v1/reload", body=json.dumps({
            "checkpoint": str(ckpt), "latent_stats": str(other_path),
        }))
        assert status == 400 and "does not match" in r["error"]

        # the stats path is fenced by the same reload roots as checkpoints
        status, r = _req(srv, "POST", "/v1/reload", body=json.dumps({
            "checkpoint": str(ckpt), "latent_stats": "/etc/passwd",
        }))
        assert status == 403
    finally:
        srv.close()

    # a recon server rejects latent_stats on reload with a clear message
    service2 = ImageScoringService(model, variables, SIZE, batch=4,
                                   dtype=jnp.float32)
    srv2 = ScoringServer(service=service2, host="127.0.0.1", port=0,
                         reload_roots=[tmp_path])
    srv2.start_background()
    try:
        status, h = _req(srv2, "GET", "/v1/health")
        assert status == 200 and h["scorer"] == "recon"
        status, r = _req(srv2, "POST", "/v1/reload", body=json.dumps({
            "checkpoint": str(tmp_path / "best_model.ckpt"),
            "latent_stats": str(tmp_path / "latent_stats.npz"),
        }))
        assert status == 400 and "--latent-stats" in r["error"]
    finally:
        srv2.close()


def test_hot_reload_video(server, tmp_path):
    """POST /v1/reload swaps weights in place: attached slots survive, the
    next chunk scores under the NEW weights (differs from the old scores),
    and mismatched checkpoints are rejected without disturbing serving."""
    from vad_tpu.utils.checkpoint import save_checkpoint

    model = VideoAutoencoder()
    frames = np.random.default_rng(11).integers(
        0, 255, size=(CHUNK, SIZE, SIZE, 3), dtype=np.uint8
    )
    _, a = _req(server, "POST", "/v1/streams")
    slot = a["slot"]
    _, r_old = _post_frames(server, slot, frames)

    assert "anomalous" not in r_old  # no calibrated threshold yet

    # same architecture, different weights, with calibrated thresholds:
    # the daemon must pick the FRAME-granularity one (its scores are per
    # frame; the sequence-level score_threshold is a different
    # distribution and would over-flag normal frames)
    v2 = model.init(jax.random.key(7), jnp.zeros((1, 2, SIZE, SIZE, 3)), train=False)
    ckpt = tmp_path / "retrained.ckpt"
    save_checkpoint(ckpt, {"model_type": "video",
                           "params": v2["params"],
                           "batch_stats": v2["batch_stats"],
                           "score_threshold": 0.03,
                           "frame_score_threshold": 0.05})
    status, r = _req(server, "POST", "/v1/reload",
                     body=json.dumps({"checkpoint": str(ckpt)}))
    assert status == 200 and r["model_type"] == "video"
    status, h = _req(server, "GET", "/v1/health")
    assert h["checkpoint"] == str(ckpt)
    assert h["score_threshold"] == 0.05
    assert slot in h["active_slots"]  # stream survived the reload

    status, r_new = _post_frames(server, slot, frames)
    assert status == 200
    assert not np.allclose(r_old["scores"], r_new["scores"])  # new weights
    # calibrated threshold drives per-frame anomaly flags in the response
    assert r_new["threshold"] == 0.05
    assert r_new["anomalous"] == [bool(s > 0.05) for s in r_new["scores"]]

    # architecture mismatch -> 400, serving continues on current weights
    small = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32)
    v3 = small.init(jax.random.key(1), jnp.zeros((1, 2, SIZE, SIZE, 3)), train=False)
    bad = tmp_path / "wrong_arch.ckpt"
    save_checkpoint(bad, {"model_type": "video",
                          "params": v3["params"],
                          "batch_stats": v3["batch_stats"]})
    status, r = _req(server, "POST", "/v1/reload",
                     body=json.dumps({"checkpoint": str(bad)}))
    assert status == 400 and "architecture" in r["error"]
    status, _ = _post_frames(server, slot, frames)
    assert status == 200  # still serving

    # image checkpoint on a video server -> 400; missing file -> 400
    imgc = tmp_path / "image.ckpt"
    save_checkpoint(imgc, {"model_type": "image", "params": {}})
    status, r = _req(server, "POST", "/v1/reload",
                     body=json.dumps({"checkpoint": str(imgc)}))
    assert status == 400 and "image checkpoint" in r["error"]
    status, _ = _req(server, "POST", "/v1/reload",
                     body=json.dumps({"checkpoint": str(tmp_path / "nope.ckpt")}))
    assert status == 400
    status, _ = _req(server, "POST", "/v1/reload", body=b"not json")
    assert status == 400
    _req(server, "DELETE", f"/v1/streams/{slot}")

    # restore the fixture's original weights: the module-scoped server is
    # shared and later tests compare against direct key(0)-init scorers
    v1 = model.init(jax.random.key(0), jnp.zeros((1, 2, SIZE, SIZE, 3)), train=False)
    orig = tmp_path / "orig.ckpt"
    save_checkpoint(orig, {"model_type": "video",
                           "params": v1["params"],
                           "batch_stats": v1["batch_stats"]})
    status, _ = _req(server, "POST", "/v1/reload",
                     body=json.dumps({"checkpoint": str(orig)}))
    assert status == 200


def test_hot_reload_image(tmp_path):
    """Image servers reload through the same endpoint; scores afterwards
    match a direct apply of the new weights."""
    from vad_tpu.eval.http_server import ImageScoringService
    from vad_tpu.models.autoencoder import ConvAutoencoder
    from vad_tpu.utils.checkpoint import save_checkpoint

    model = ConvAutoencoder(latent_dim=64)
    v1 = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    service = ImageScoringService(model, v1, SIZE, batch=4, dtype=jnp.float32)
    srv = ScoringServer(service=service, host="127.0.0.1", port=0,
                        reload_roots=[tmp_path])
    srv.start_background()
    try:
        imgs = np.random.default_rng(3).integers(
            0, 255, size=(2, SIZE, SIZE, 3), dtype=np.uint8
        )
        v2 = model.init(jax.random.key(9), jnp.zeros((1, SIZE, SIZE, 3)), train=False)
        ckpt = tmp_path / "img2.ckpt"
        save_checkpoint(ckpt, {"model_type": "image",
                               "params": v2["params"],
                               "batch_stats": v2["batch_stats"]})
        status, r = _req(srv, "POST", "/v1/reload",
                         body=json.dumps({"checkpoint": str(ckpt)}))
        assert status == 200 and r["model_type"] == "image"
        status, r = _req(srv, "POST", "/v1/images", body=imgs.tobytes(),
                         headers={"X-Frames-Shape": f"2,{SIZE},{SIZE},3"})
        assert status == 200
        x = jnp.asarray(imgs, jnp.float32) / 127.5 - 1.0
        want = model.apply(v2, x, method=ConvAutoencoder.reconstruction_error)
        np.testing.assert_allclose(r["scores"], np.asarray(want), rtol=1e-4, atol=1e-6)
        # a video checkpoint is rejected
        bad = tmp_path / "vid.ckpt"
        save_checkpoint(bad, {"params": {}})
        status, r = _req(srv, "POST", "/v1/reload",
                         body=json.dumps({"checkpoint": str(bad)}))
        assert status == 400 and "image checkpoint" in r["error"]
        # a different-resolution retrain is rejected: fully-convolutional
        # weights pass the structural check at any size, so without the
        # args guard it would swap in silently and score garbage
        other_res = tmp_path / "bigres.ckpt"
        save_checkpoint(other_res, {"model_type": "image",
                                    "params": v2["params"],
                                    "batch_stats": v2["batch_stats"],
                                    "args": {"image_size": SIZE * 2}})
        status, r = _req(srv, "POST", "/v1/reload",
                         body=json.dumps({"checkpoint": str(other_res)}))
        assert status == 400 and "image_size" in r["error"]
    finally:
        srv.close()


def test_python_client(server, tmp_path):
    """ScoringClient drives the full protocol against a live daemon and
    its responses match the raw-HTTP helpers used elsewhere in this file."""
    from vad_tpu.eval.client import ScoringClient, ScoringError

    c = ScoringClient("127.0.0.1", server.port)
    h = c.health()
    assert h["model_type"] == "video" and h["num_slots"] == SLOTS

    slot = c.attach()
    frames = np.random.default_rng(21).integers(
        0, 255, size=(CHUNK, SIZE, SIZE, 3), dtype=np.uint8
    )
    out = c.score_chunk(slot, frames)
    assert len(out["scores"]) == CHUNK
    _, raw = _post_frames(server, slot, frames)
    assert len(raw["scores"]) == CHUNK  # same live stream, next chunk

    m = c.metrics()
    assert m["requests"] >= 2

    # error surfaces with the server's message and status
    with pytest.raises(ScoringError) as exc:
        c.score_chunk(slot, frames[:1])  # wrong chunk length
    assert exc.value.status == 400 and "expected" in exc.value.message
    with pytest.raises(ScoringError):
        c.score_images(frames)  # video daemon has no image model
    with pytest.raises(ScoringError):
        c.reload(str(tmp_path / "missing.ckpt"))
    c.detach(slot)
    with pytest.raises(ScoringError):
        c.detach(slot + 1000)


def test_dual_model_serving(tmp_path):
    """One daemon, both models: /v1/streams and /v1/images live at once,
    per-kind health/metrics sections, /v1/reload routed by checkpoint
    kind (the daemon equivalent of the UI's dual-model AppState)."""
    from vad_tpu.eval.http_server import ImageScoringService, ScoringService
    from vad_tpu.models.autoencoder import ConvAutoencoder
    from vad_tpu.utils.checkpoint import save_checkpoint

    vmodel = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32)
    vvars = vmodel.init(jax.random.key(0), jnp.zeros((1, 2, SIZE, SIZE, 3)), train=False)
    scorer = MultiStreamScorer(vmodel, vvars, SLOTS, CHUNK, SIZE)
    imodel = ConvAutoencoder(latent_dim=64)
    ivars = imodel.init(jax.random.key(1), jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    iservice = ImageScoringService(imodel, ivars, SIZE, batch=4, dtype=jnp.float32)
    srv = ScoringServer(host="127.0.0.1", port=0,
                        services={"video": ScoringService(scorer), "image": iservice},
                        reload_roots=[tmp_path])
    srv.start_background()
    try:
        status, h = _req(srv, "GET", "/v1/health")
        assert status == 200 and h["model_type"] == "image+video"
        assert h["video"]["num_slots"] == SLOTS and h["image"]["batch"] == 4

        # both endpoints live in one daemon
        rng = np.random.default_rng(8)
        imgs = rng.integers(0, 255, size=(2, SIZE, SIZE, 3), dtype=np.uint8)
        status, r = _req(srv, "POST", "/v1/images", body=imgs.tobytes(),
                         headers={"X-Frames-Shape": f"2,{SIZE},{SIZE},3"})
        assert status == 200 and len(r["scores"]) == 2
        _, a = _req(srv, "POST", "/v1/streams")
        frames = rng.integers(0, 255, size=(CHUNK, SIZE, SIZE, 3), dtype=np.uint8)
        status, r = _post_frames(srv, a["slot"], frames)
        assert status == 200 and len(r["scores"]) == CHUNK

        status, m = _req(srv, "GET", "/v1/metrics")
        assert m["image"]["requests"] == 1 and m["video"]["requests"] == 1

        # reload routes by the checkpoint's kind
        iv2 = imodel.init(jax.random.key(5), jnp.zeros((1, SIZE, SIZE, 3)), train=False)
        ick = tmp_path / "img.ckpt"
        save_checkpoint(ick, {"model_type": "image", "params": iv2["params"],
                              "batch_stats": iv2["batch_stats"],
                              "score_threshold": 0.02})
        status, r = _req(srv, "POST", "/v1/reload",
                         body=json.dumps({"checkpoint": str(ick)}))
        assert status == 200 and r["model_type"] == "image"
        _, h2 = _req(srv, "GET", "/v1/health")
        assert h2["image"]["checkpoint"] == str(ick)
        assert h2["image"]["score_threshold"] == 0.02
        assert h2["video"]["checkpoint"] is None  # video untouched

        vv2 = vmodel.init(jax.random.key(6), jnp.zeros((1, 2, SIZE, SIZE, 3)), train=False)
        vck = tmp_path / "vid.ckpt"
        save_checkpoint(vck, {"model_type": "video", "params": vv2["params"],
                              "batch_stats": vv2["batch_stats"]})
        status, r = _req(srv, "POST", "/v1/reload",
                         body=json.dumps({"checkpoint": str(vck)}))
        assert status == 200 and r["model_type"] == "video"
        _, h3 = _req(srv, "GET", "/v1/health")
        assert h3["video"]["checkpoint"] == str(vck)

        # server-level reload (the --watch target) routes the same way
        assert srv.reload(str(ick)) == "image"
    finally:
        srv.close()


def test_checkpoint_watcher(tmp_path):
    """serve.py --watch: the watcher deploys the newest best_model.ckpt in
    a results tree, skips unchanged polls, and survives bad checkpoints."""
    import os
    import time

    from vad_tpu.eval.http_server import CheckpointWatcher, ImageScoringService
    from vad_tpu.models.autoencoder import ConvAutoencoder
    from vad_tpu.utils.checkpoint import save_checkpoint

    model = ConvAutoencoder(latent_dim=64)
    v1 = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    service = ImageScoringService(model, v1, SIZE, batch=4, dtype=jnp.float32)

    run1 = tmp_path / "synthetic_a" / "best_model.ckpt"
    save_checkpoint(run1, {"model_type": "image", "params": v1["params"],
                           "batch_stats": v1["batch_stats"]})
    watcher = CheckpointWatcher(service, tmp_path, initial=str(run1))
    assert watcher.poll_once() is False  # the served checkpoint is current

    v2 = model.init(jax.random.key(9), jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    run2 = tmp_path / "synthetic_b" / "best_model.ckpt"
    save_checkpoint(run2, {"model_type": "image", "params": v2["params"],
                           "batch_stats": v2["batch_stats"]})
    os.utime(run2, (time.time() + 5, time.time() + 5))  # strictly newest
    assert watcher.poll_once() is True
    assert service.checkpoint == str(run2)
    assert watcher.poll_once() is False  # unchanged -> no re-deploy

    # a newer but architecture-incompatible checkpoint must not take
    # down serving; the watcher retries (and keeps failing) harmlessly
    small = ConvAutoencoder(latent_dim=16)
    v3 = small.init(jax.random.key(2), jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    run3 = tmp_path / "synthetic_c" / "best_model.ckpt"
    save_checkpoint(run3, {"model_type": "image", "params": v3["params"],
                           "batch_stats": v3["batch_stats"]})
    os.utime(run3, (time.time() + 10, time.time() + 10))
    assert watcher.poll_once() is False
    assert service.checkpoint == str(run2)  # still on the good weights
    imgs = np.zeros((2, SIZE, SIZE, 3), np.uint8)
    assert np.isfinite(service.score_images(imgs)).all()

    # watching a single FILE tracks its mtime
    watcher_f = CheckpointWatcher(service, run2, initial=str(run2))
    assert watcher_f.poll_once() is False
    save_checkpoint(run2, {"model_type": "image", "params": v1["params"],
                           "batch_stats": v1["batch_stats"]})
    os.utime(run2, (time.time() + 20, time.time() + 20))
    assert watcher_f.poll_once() is True


def test_watcher_dual_kinds_and_supersession(tmp_path):
    """Regression: the watcher must deploy the newest retrain of EACH
    model kind (not just the globally newest file), and an older changed
    checkpoint of an already-updated kind must be superseded, never
    rolled back onto the newer one."""
    import os
    import time
    from types import SimpleNamespace

    from vad_tpu.eval.http_server import (
        CheckpointWatcher, ImageScoringService, ScoringService,
    )
    from vad_tpu.models.autoencoder import ConvAutoencoder
    from vad_tpu.utils.checkpoint import save_checkpoint

    vmodel = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32)
    vvars = vmodel.init(jax.random.key(0), jnp.zeros((1, 2, SIZE, SIZE, 3)), train=False)
    vsvc = ScoringService(MultiStreamScorer(vmodel, vvars, 2, CHUNK, SIZE))
    imodel = ConvAutoencoder(latent_dim=64)
    ivars = imodel.init(jax.random.key(1), jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    isvc = ImageScoringService(imodel, ivars, SIZE, batch=2, dtype=jnp.float32)
    target = SimpleNamespace(services={"video": vsvc, "image": isvc})
    try:
        now = time.time()
        paths = {}
        for name, payload, age in (
            ("img_old", {"model_type": "image", "params": ivars["params"],
                         "batch_stats": ivars["batch_stats"],
                         "score_threshold": 0.01}, 30),
            ("vid", {"model_type": "video", "params": vvars["params"],
                     "batch_stats": vvars["batch_stats"]}, 20),
            ("img_new", {"model_type": "image", "params": ivars["params"],
                         "batch_stats": ivars["batch_stats"],
                         "score_threshold": 0.02}, 10),
        ):
            p = tmp_path / name / "best_model.ckpt"
            save_checkpoint(p, payload)
            os.utime(p, (now - age, now - age))
            paths[name] = str(p)

        w = CheckpointWatcher(target, tmp_path)
        assert w.poll_once() is True
        # newest image deployed (old one superseded), AND the video one —
        # which is older than img_new — deployed too
        assert isvc.checkpoint == paths["img_new"]
        assert isvc.score_threshold == 0.02
        assert vsvc.checkpoint == paths["vid"]
        assert w.poll_once() is False  # steady state: nothing changed
        # the superseded old image checkpoint never deploys later either
        assert isvc.checkpoint == paths["img_new"]
    finally:
        vsvc.close()


def test_metrics_endpoint(server):
    """/v1/metrics tracks requests, frames, device steps, latency, errors."""
    status, m0 = _req(server, "GET", "/v1/metrics")
    assert status == 200
    _, r = _req(server, "POST", "/v1/streams")
    frames = np.random.default_rng(3).integers(
        0, 255, size=(CHUNK, SIZE, SIZE, 3), dtype=np.uint8
    )
    _post_frames(server, r["slot"], frames)
    _post_frames(server, r["slot"], frames)
    status, m = _req(server, "GET", "/v1/metrics")
    assert status == 200
    assert m["requests"] == m0["requests"] + 2
    assert m["frames_scored"] == m0["frames_scored"] + 2 * CHUNK
    assert m["device_steps"] >= m0["device_steps"] + 2
    lat = m["device_step_latency"]
    assert lat["count"] == m["device_steps"]
    assert sum(lat["hist_counts"]) == lat["count"]
    assert lat["min_ms"] <= lat["mean_ms"] <= lat["max_ms"]
    # a bad request increments the error counter
    status, _ = _req(server, "POST", f"/v1/streams/{r['slot']}/frames",
                     body=b"x", headers={"X-Frames-Shape": "1,1,1,3"})
    assert status == 400
    _, m2 = _req(server, "GET", "/v1/metrics")
    assert m2["errors"] == m["errors"] + 1
    _req(server, "DELETE", f"/v1/streams/{r['slot']}")


def test_image_service_mesh_parity():
    """Image scoring under the mesh (data-parallel and data+spatial)
    matches the plain single-device service; data-parallel is bitwise
    (shard_map never mixes batch elements), spatial is float-close (the
    partitioner reassociates conv accumulations at halo edges)."""
    from vad_tpu.eval.http_server import ImageScoringService
    from vad_tpu.models.autoencoder import ConvAutoencoder
    from vad_tpu.parallel.sharding import get_mesh

    model = ConvAutoencoder(latent_dim=64)
    variables = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 255, size=(5, SIZE, SIZE, 3), dtype=np.uint8)

    plain = ImageScoringService(model, variables, SIZE, batch=4, dtype=jnp.float32)
    want = plain.score_images(imgs)

    mesh = get_mesh(model_parallel=2)  # (data=4, model=2)
    dp = ImageScoringService(
        model, variables, SIZE, batch=4, dtype=jnp.float32, mesh=mesh
    )
    assert dp.batch == 4  # already a multiple of data=4
    np.testing.assert_array_equal(dp.score_images(imgs), want)

    sp = ImageScoringService(
        model, variables, SIZE, batch=4, dtype=jnp.float32, mesh=mesh, spatial=True
    )
    np.testing.assert_allclose(sp.score_images(imgs), want, rtol=5e-4, atol=1e-7)

    with pytest.raises(ValueError, match="requires a mesh"):
        ImageScoringService(model, variables, SIZE, batch=4, spatial=True)
    with pytest.raises(ValueError, match="divide"):
        # H=48 -> H/16=3 latent rows do not split over model axis of 2
        ImageScoringService(model, variables, 48, batch=4, mesh=mesh, spatial=True)


def test_video_mode_rejects_image_endpoint(server):
    status, _ = _req(server, "POST", "/v1/images",
                     body=b"", headers={"X-Frames-Shape": "0,1,1,3"})
    assert status == 400


def test_idle_slots_keep_their_state(server):
    """A busy neighbour stream must not advance an idle stream's carried
    ConvLSTM state with zero-filled frames (regression: the coalescing
    batch pads non-submitting slots with zeros)."""
    rng = np.random.default_rng(4)
    chunk_a = rng.integers(0, 255, size=(CHUNK, SIZE, SIZE, 3), dtype=np.uint8)
    chunk_b = rng.integers(0, 255, size=(CHUNK, SIZE, SIZE, 3), dtype=np.uint8)

    _, a = _req(server, "POST", "/v1/streams")
    _, b = _req(server, "POST", "/v1/streams")
    # B scores a chunk, then sits idle while A ticks several times
    _, first_b = _post_frames(server, b["slot"], chunk_b)
    for _ in range(3):
        _post_frames(server, a["slot"], chunk_a)
    _, second_b = _post_frames(server, b["slot"], chunk_b)

    # reference: an isolated scorer fed the same two B chunks back to back
    model = VideoAutoencoder()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, SIZE, SIZE, 3)), train=False)
    ref = MultiStreamScorer(model, variables, SLOTS, CHUNK, SIZE)
    rs = ref.attach()
    batch = np.zeros((SLOTS, CHUNK, SIZE, SIZE, 3), np.uint8)
    batch[rs] = chunk_b
    want_first = ref.score_chunk(batch)[rs]
    want_second = ref.score_chunk(batch)[rs]

    np.testing.assert_allclose(first_b["scores"], want_first, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(second_b["scores"], want_second, rtol=1e-5, atol=1e-6)
    _req(server, "DELETE", f"/v1/streams/{a['slot']}")
    _req(server, "DELETE", f"/v1/streams/{b['slot']}")


def test_spatial_sharded_server_parity():
    """The daemon over a spatially-partitioned scorer (slots on 'data',
    image rows on 'model') returns the same scores as a plain scorer."""
    from vad_tpu.parallel.sharding import get_mesh

    model = VideoAutoencoder()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, SIZE, SIZE, 3)), train=False)
    mesh = get_mesh(model_parallel=2)  # (data=4, model=2)
    scorer = MultiStreamScorer(model, variables, 4, CHUNK, SIZE, mesh=mesh, spatial=True)
    srv = ScoringServer(scorer, host="127.0.0.1", port=0)
    srv.start_background()
    try:
        _, r = _req(srv, "POST", "/v1/streams")
        rng = np.random.default_rng(9)
        frames = rng.integers(0, 255, size=(CHUNK, SIZE, SIZE, 3), dtype=np.uint8)
        _, got = _post_frames(srv, r["slot"], frames)

        ref = MultiStreamScorer(model, variables, SLOTS, CHUNK, SIZE)
        rs = ref.attach()
        batch = np.zeros((SLOTS, CHUNK, SIZE, SIZE, 3), np.uint8)
        batch[rs] = frames
        want = ref.score_chunk(batch)[rs]
        np.testing.assert_allclose(got["scores"], want, rtol=2e-5, atol=1e-6)
    finally:
        srv.close()


def test_prometheus_metrics_format(server):
    """GET /v1/metrics?format=prometheus emits valid text exposition:
    counters labeled by model kind, a cumulative-le latency histogram."""
    # ensure at least one request/step is on the books
    _, r = _req(server, "POST", "/v1/streams")
    frames = np.random.default_rng(7).integers(
        0, 255, size=(CHUNK, SIZE, SIZE, 3), dtype=np.uint8
    )
    _post_frames(server, r["slot"], frames)
    _req(server, "DELETE", f"/v1/streams/{r['slot']}")

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
    conn.request("GET", "/v1/metrics?format=prometheus")
    resp = conn.getresponse()
    text = resp.read().decode()
    ctype = resp.getheader("Content-Type")
    conn.close()
    assert resp.status == 200
    assert ctype.startswith("text/plain")
    assert '# TYPE vad_requests_total counter' in text
    assert 'vad_requests_total{model="video"} ' in text
    assert 'vad_frames_scored_total{model="video"} ' in text
    # histogram: cumulative buckets ending in +Inf, sum and count present
    _, m = _req(server, "GET", "/v1/metrics")
    lat = m["device_step_latency"]
    inf_line = f'vad_device_step_latency_ms_bucket{{model="video",le="+Inf"}} {lat["count"]}'
    assert inf_line in text
    assert f'vad_device_step_latency_ms_count{{model="video"}} {lat["count"]}' in text
    # bucket counts are monotone non-decreasing (cumulative)
    buckets = [int(line.rsplit(" ", 1)[1]) for line in text.splitlines()
               if line.startswith("vad_device_step_latency_ms_bucket")]
    assert buckets == sorted(buckets)


def test_frames_shape_rejected_before_buffering(server):
    """A wrong DECLARED shape on /v1/streams/<s>/frames 400s without the
    server buffering the (possibly huge) body, mirroring /v1/images."""
    _, r = _req(server, "POST", "/v1/streams")
    # declared T is wrong -> rejected on the header alone (tiny body sent)
    status, err = _req(
        server, "POST", f"/v1/streams/{r['slot']}/frames", body=b"",
        headers={"X-Frames-Shape": f"{CHUNK + 1},{SIZE},{SIZE},3",
                 "Content-Length": "0"},
    )
    assert status == 400 and "expected X-Frames-Shape" in err["error"]
    # right shape, wrong Content-Length -> rejected before np sees it
    status, err = _req(
        server, "POST", f"/v1/streams/{r['slot']}/frames", body=b"xy",
        headers={"X-Frames-Shape": f"{CHUNK},{SIZE},{SIZE},3"},
    )
    assert status == 400 and "Content-Length" in err["error"]
    _req(server, "DELETE", f"/v1/streams/{r['slot']}")


def test_slot_ttl_reaps_idle_slots():
    """With --slot-ttl, attach() under full occupancy reclaims expired
    idle slots (never ones with a chunk in flight)."""
    from concurrent.futures import Future

    from vad_tpu.eval.http_server import ScoringService

    model = VideoAutoencoder()
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 2, SIZE, SIZE, 3)), train=False
    )
    scorer = MultiStreamScorer(model, variables, 2, CHUNK, SIZE)
    svc = ScoringService(scorer, slot_ttl=10.0)
    try:
        t = [1000.0]
        svc._now = lambda: t[0]
        a = svc.attach()
        b = svc.attach()
        # capacity full, nothing expired -> attach still fails
        with pytest.raises(RuntimeError):
            svc.attach()
        # expire both, but give A a chunk in flight: only B is reapable
        t[0] += 11.0
        with svc._lock:
            svc._pending[a] = (np.zeros((CHUNK, SIZE, SIZE, 3), np.uint8), Future())
        got = svc.attach()
        assert got == b  # B reaped and recycled; A survived its TTL
        with svc._lock:
            svc._pending.pop(a)
        assert sorted(int(s) for s in scorer.active_slots) == sorted([a, got])
        # without a TTL, a full scorer never reaps
        svc2 = ScoringService(MultiStreamScorer(model, variables, 1, CHUNK, SIZE))
        try:
            svc2.attach()
            with pytest.raises(RuntimeError):
                svc2.attach()
        finally:
            svc2.close()
    finally:
        svc.close()


def test_fuzz_never_kills_the_server(server):
    """Hostile/garbage traffic must map to 4xx JSON errors (or a closed
    connection), never crash the daemon or wedge later well-formed
    requests.  Every case ends with a healthy /v1/health + a real score
    round-trip, so a handler that died mid-request would be caught."""
    import socket

    rng = np.random.default_rng(7)

    def raw(payload: bytes):
        """Send raw bytes on a fresh socket; tolerate any server reply."""
        s = socket.create_connection(("127.0.0.1", server.port), timeout=30)
        try:
            s.sendall(payload)
            s.settimeout(30)
            try:
                s.recv(4096)
            except (TimeoutError, ConnectionError, OSError):
                pass
        finally:
            s.close()

    cases = [
        b"\x00\xff\x17garbage not http\r\n\r\n",
        b"GET /../../etc/passwd HTTP/1.1\r\nHost: x\r\n\r\n",
        b"POST /v1/streams/0/frames HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: 999999\r\nX-Frames-Shape: 4,64,64,3\r\n\r\nshort",
        b"POST /v1/images HTTP/1.1\r\nHost: x\r\nContent-Length: -5\r\n\r\n",
        b"PATCH /v1/health HTTP/1.1\r\nHost: x\r\n\r\n",
    ]
    for payload in cases:
        raw(payload)

    # structured-but-wrong requests through the normal client path
    bad = [
        ("POST", "/v1/streams/not-an-int/frames", b"x", {"X-Frames-Shape": "1"}),
        ("POST", "/v1/streams/0/frames", b"x" * 64,
         {"X-Frames-Shape": "totally,bogus"}),
        ("POST", "/v1/streams/0/frames", b"x" * 64,
         {"X-Frames-Shape": "1,2,3,4,5,6,7,8"}),
        ("POST", "/v1/reload", b"{not json", {}),
        ("POST", "/v1/reload", json.dumps({"checkpoint": "/nonexistent"}).encode(), {}),
        ("GET", "/v1/nope", None, {}),
        ("DELETE", "/v1/streams/99999", None, {}),
    ]
    for method, path, body, headers in bad:
        try:
            status, r = _req(server, method, path, body=body, headers=headers)
        except (json.JSONDecodeError, ConnectionError, http.client.HTTPException):
            continue  # a non-JSON 4xx page or dropped conn is acceptable
        assert 400 <= status < 500, (method, path, status, r)

    # random binary fuzz on the frames endpoint with a VALID shape header
    status, r = _req(server, "POST", "/v1/streams")
    slot = r["slot"]
    for _ in range(3):
        blob = rng.bytes(int(rng.integers(1, 4 * SIZE * SIZE * 3)))
        status, r = _req(
            server, "POST", f"/v1/streams/{slot}/frames", body=blob,
            headers={"X-Frames-Shape": f"{CHUNK},{SIZE},{SIZE},3"},
        )
        assert status == 400 and "error" in r  # length mismatch

    # the server is still fully functional
    frames = rng.integers(0, 255, size=(CHUNK, SIZE, SIZE, 3), dtype=np.uint8)
    status, r = _post_frames(server, slot, frames)
    assert status == 200 and len(r["scores"]) == CHUNK
    _req(server, "DELETE", f"/v1/streams/{slot}")
    status, health = _req(server, "GET", "/v1/health")
    assert status == 200 and health["active_slots"] == []
