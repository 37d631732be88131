"""StableHLO export artifacts (vad_tpu/utils/export.py): roundtrip
fidelity vs the live scoring paths, shape polymorphism, state
threading, and the export CLI."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vad_tpu.utils.export import (
    export_image_scorer,
    export_video_stream_step,
    load_artifact,
    save_artifact,
)


@pytest.fixture(scope="module")
def image_model():
    from vad_tpu.models.autoencoder import ConvAutoencoder

    model = ConvAutoencoder()
    variables = model.init(
        jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32), train=False
    )
    return model, variables


@pytest.fixture(scope="module")
def video_model():
    from vad_tpu.models.video_autoencoder import VideoAutoencoder

    model = VideoAutoencoder(backend="xla")
    variables = model.init(
        jax.random.key(0), np.zeros((1, 2, 64, 64, 3), np.float32), train=False
    )
    return model, variables


def _direct_image_scores(model, variables, u8):
    from vad_tpu.models.autoencoder import ConvAutoencoder

    x = u8.astype(np.float32) / 127.5 - 1.0
    return np.asarray(model.apply(
        variables, x, method=ConvAutoencoder.reconstruction_error
    ))


def test_image_polymorphic_batch_roundtrip(image_model, tmp_path):
    """One artifact, ANY batch size: disk-roundtripped scores match the
    live model at two different batch sizes (float tolerance — the
    polymorphic artifact is a separate lowering, reductions may fuse
    differently by 1 ulp)."""
    model, variables = image_model
    exported = export_image_scorer(model, variables, 64, batch=None,
                                   dtype=jnp.float32)
    path = save_artifact(exported, tmp_path / "img.stablehlo")
    loaded = load_artifact(path)
    rng = np.random.default_rng(0)
    for b in (3, 7):
        u8 = rng.integers(0, 255, (b, 64, 64, 3), np.uint8)
        got = np.asarray(loaded.call(u8))
        assert got.shape == (b,)
        np.testing.assert_allclose(
            got, _direct_image_scores(model, variables, u8),
            rtol=1e-6, atol=1e-7,
        )


def test_image_pinned_batch_rejects_other_sizes(image_model):
    model, variables = image_model
    exported = export_image_scorer(model, variables, 64, batch=4,
                                   dtype=jnp.float32)
    u8 = np.zeros((4, 64, 64, 3), np.uint8)
    assert np.asarray(exported.call(u8)).shape == (4,)
    with pytest.raises(Exception):
        exported.call(np.zeros((2, 64, 64, 3), np.uint8))


def test_video_stream_step_threads_state_like_scorer(video_model, tmp_path):
    """The exported step, state threaded across two calls by hand, must
    reproduce MultiStreamScorer's scores (to float tolerance across the
    two independent lowerings) — artifact consumers get the daemon's
    scoring, not an approximation of it."""
    from vad_tpu.eval.serving import MultiStreamScorer
    from vad_tpu.models.video_autoencoder import ConvLSTM

    model, variables = video_model
    slots, chunk = 2, 4
    exported = export_video_stream_step(
        model, variables, num_slots=slots, chunk=chunk, image_size=64,
        dtype=jnp.float32,
    )
    loaded = load_artifact(save_artifact(exported, tmp_path / "vid.stablehlo"))

    scorer = MultiStreamScorer(model, variables, num_slots=slots, chunk=chunk,
                               image_size=64)
    scorer.attach(0)
    scorer.attach(1)

    states = ConvLSTM.zero_state(model.lstm_layers, slots, 4, 4,
                                 model.lstm_hidden_dim, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    submitted = np.ones(slots, bool)
    for _ in range(2):
        frames = rng.integers(0, 255, (slots, chunk, 64, 64, 3), np.uint8)
        want = scorer.score_chunk(frames)
        scores, states = loaded.call(frames, states, submitted)
        np.testing.assert_allclose(np.asarray(scores), want,
                                   rtol=1e-5, atol=1e-7)


def test_video_submitted_mask_preserves_state(video_model):
    """Unsubmitted slots must keep their carried (h, c) bit-identical
    through a step (the daemon's padding contract survives export)."""
    from vad_tpu.models.video_autoencoder import ConvLSTM

    model, variables = video_model
    exported = export_video_stream_step(
        model, variables, num_slots=2, chunk=2, image_size=64,
        dtype=jnp.float32,
    )
    states = ConvLSTM.zero_state(model.lstm_layers, 2, 4, 4,
                                 model.lstm_hidden_dim, dtype=jnp.float32)
    frames = np.random.default_rng(2).integers(0, 255, (2, 2, 64, 64, 3), np.uint8)
    # advance both slots once so states are nonzero
    _, states = exported.call(frames, states, np.ones(2, bool))
    # now only slot 0 submits
    _, after = exported.call(frames, states, np.array([True, False]))
    for (h0, c0), (h1, c1) in zip(states, after):
        np.testing.assert_array_equal(np.asarray(h0)[1], np.asarray(h1)[1])
        np.testing.assert_array_equal(np.asarray(c0)[1], np.asarray(c1)[1])
        assert not np.array_equal(np.asarray(h0)[0], np.asarray(h1)[0])


def test_sidecar_poly_flag_false_for_fixed_multiplatform(image_model, tmp_path):
    """Fixed-shape multi-platform artifacts must NOT be labeled
    shape-polymorphic (Exported.uses_global_constants is True for them
    because of the platform index — the sidecar reads the avals)."""
    model, variables = image_model
    exported = export_image_scorer(model, variables, 64, batch=4,
                                   dtype=jnp.float32,
                                   platforms=("cpu", "tpu"))
    assert sorted(exported.platforms) == ["cpu", "tpu"]
    save_artifact(exported, tmp_path / "mp.stablehlo")
    sidecar = json.loads((tmp_path / "mp.stablehlo.json").read_text())
    assert sidecar["uses_shape_polymorphism"] is False
    # and the multi-platform artifact still runs on this (cpu) host
    got = np.asarray(load_artifact(tmp_path / "mp.stablehlo").call(
        np.zeros((4, 64, 64, 3), np.uint8)))
    assert got.shape == (4,)


def test_sidecar_records_calling_convention(image_model, tmp_path):
    model, variables = image_model
    exported = export_image_scorer(model, variables, 64, dtype=jnp.float32)
    path = save_artifact(exported, tmp_path / "a.stablehlo", meta={"kind": "image"})
    sidecar = json.loads((tmp_path / "a.stablehlo.json").read_text())
    assert sidecar["kind"] == "image"
    assert sidecar["uses_shape_polymorphism"] is True
    assert sidecar["bytes"] == (tmp_path / "a.stablehlo").stat().st_size
    assert sidecar["platforms"]
    assert any("ui8" in a or "uint8" in a for a in sidecar["in_avals"])


def test_export_cli_from_video_checkpoint(video_model, tmp_path):
    """export_model.py end to end on a self-describing checkpoint."""
    import export_model as cli

    from vad_tpu.utils.checkpoint import save_checkpoint

    model, variables = video_model
    ckpt_path = tmp_path / "best_model.ckpt"
    save_checkpoint(ckpt_path, {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats") or {},
        "model_type": "video",
        "args": {"image_size": 64},
        "frame_score_threshold": 0.01,
    })
    out = tmp_path / "vid.stablehlo"
    import sys
    from unittest import mock

    argv = ["export_model.py", "--checkpoint", str(ckpt_path),
            "--output", str(out), "--slots", "2", "--chunk", "2",
            "--dtype", "float32"]
    with mock.patch.object(sys, "argv", argv):
        cli.main()
    assert out.exists()
    sidecar = json.loads((tmp_path / "vid.stablehlo.json").read_text())
    assert sidecar["kind"] == "video"
    assert sidecar["num_slots"] == 2
    assert sidecar["score_threshold"] == 0.01
    loaded = load_artifact(out)
    from vad_tpu.models.video_autoencoder import ConvLSTM

    states = ConvLSTM.zero_state(model.lstm_layers, 2, 4, 4,
                                 model.lstm_hidden_dim, dtype=jnp.float32)
    scores, _ = loaded.call(
        np.zeros((2, 2, 64, 64, 3), np.uint8), states, np.ones(2, bool)
    )
    assert np.asarray(scores).shape == (2, 2)
