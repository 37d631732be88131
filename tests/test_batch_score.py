"""Batch multi-video scoring (evaluate_video --video-dir).

Videos batched over MultiStreamScorer slots must score exactly like the
single-stream streaming path, slots must recycle when there are more
videos than slots, and one bad file must not abort the batch.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def small_model():
    from vad_tpu.models.video_autoencoder import VideoAutoencoder

    model = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32, lstm_layers=2)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 2, 64, 64, 3)), train=False
    )
    return model, variables


@pytest.fixture(scope="module")
def clips(tmp_path_factory):
    """Three clips with deliberately awkward lengths: one aligned to the
    chunk, one shorter than a chunk, one spanning 5 chunks with a tail."""
    from vad_tpu.data.synthetic import create_synthetic_video_file

    root = tmp_path_factory.mktemp("clips")
    lengths = {"a.mp4": 16, "b.mp4": 5, "c.mp4": 35}
    paths = {}
    for i, (name, n) in enumerate(lengths.items()):
        paths[str(root / name)] = n
        create_synthetic_video_file(
            str(root / name), n_frames=n, image_size=64, seed=i,
            anomaly_range=(10, 14) if n > 14 else None,
        )
    return root, paths


def test_batch_matches_single_stream(small_model, clips):
    """Scores from the slot-batched scorer == scoring each video alone
    through the streaming path (slots never interact)."""
    from vad_tpu.eval.batch_score import score_videos
    from vad_tpu.eval.video_render import stream_scores

    model, variables = small_model
    _, paths = clips

    results = score_videos(
        model, variables, list(paths), image_size=64, chunk=8, num_slots=2
    )
    assert set(results) == set(paths)
    for path, n_frames in paths.items():
        got = results[path]
        assert got["error"] is None
        assert len(got["scores"]) == n_frames  # every frame scored once
        alone = stream_scores(model, variables, path, 64, chunk=8)
        np.testing.assert_allclose(got["scores"], alone, atol=1e-5, rtol=1e-4)


def test_unreadable_file_does_not_abort_batch(small_model, clips, tmp_path):
    from vad_tpu.eval.batch_score import score_videos

    model, variables = small_model
    _, paths = clips
    garbage = tmp_path / "garbage.mp4"
    garbage.write_bytes(b"this is not a video")
    good = next(iter(paths))

    results = score_videos(
        model, variables, [str(garbage), good], image_size=64, chunk=8,
        num_slots=2,
    )
    # cv2 yields no frames for the garbage file -> 0 scores, no crash
    assert len(results[str(garbage)]["scores"]) == 0
    assert len(results[good]["scores"]) == paths[good]


def test_score_video_dir_end_to_end(small_model, clips, tmp_path):
    """CLI-level path: checkpoint in, batch_scores.json + timelines out,
    frames flagged against the calibrated frame threshold."""
    from vad_tpu.eval.batch_score import score_video_dir
    from vad_tpu.utils.checkpoint import save_checkpoint

    model, variables = small_model
    root, paths = clips

    ckpt_path = tmp_path / "best_model.ckpt"
    save_checkpoint(ckpt_path, {
        "model_type": "video",
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "args": {"image_size": 64, "sequence_length": 8, "latent_dim": 32,
                 "lstm_hidden_dim": 32, "lstm_layers": 2},
        "frame_score_threshold": 0.05,
        "epoch": 1,
    })

    out_dir = tmp_path / "out"
    summary = score_video_dir(
        str(ckpt_path), str(root), output_dir=str(out_dir), num_slots=2
    )

    written = json.loads((out_dir / "batch_scores.json").read_text())
    assert written["frame_score_threshold"] == 0.05
    assert set(written["videos"]) == set(paths)
    for path, n_frames in paths.items():
        entry = written["videos"][path]
        assert entry["frames"] == n_frames
        assert entry["mean_score"] > 0
        assert "anomalous_frames" in entry  # threshold flagging active
        assert (out_dir / f"{path.rsplit('/', 1)[-1][:-4]}_timeline.png").exists()
    assert summary["videos"] == written["videos"]


def test_empty_dir_raises(small_model, tmp_path):
    from vad_tpu.eval.batch_score import score_video_dir

    with pytest.raises(FileNotFoundError):
        score_video_dir("unused.ckpt", str(tmp_path))
