"""End-to-end video pipeline: train CLI -> evaluate CLI -> video render.

Tiny IPAD-format synthetic fixture, 8-virtual-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def trained_video_run(tmp_path_factory):
    from vad_tpu.data.synthetic import create_synthetic_video_data
    import train_video as tv_cli
    from vad_tpu.train.video_trainer import train

    root = tmp_path_factory.mktemp("e2e_video")
    data_dir = root / "data"
    create_synthetic_video_data(
        str(data_dir), "S01", n_train_videos=2, n_test_videos=2,
        frames_per_video=24, image_size=64,
    )
    args = tv_cli.build_parser().parse_args(
        [
            "--category", "S01",
            "--data-dir", str(data_dir),
            "--image-size", "64",
            "--sequence-length", "8",
            "--stride", "8",
            "--latent-dim", "32",
            "--lstm-hidden-dim", "32",
            "--lstm-layers", "2",
            "--epochs", "2",
            "--batch-size", "2",
            "--num-workers", "2",
            "--results-dir", str(root / "results"),
        ]
    )
    out = train(args)
    return {"data_dir": data_dir, "results_dir": out["results_dir"], "history": out["history"]}


def test_video_training_artifacts(trained_video_run):
    rd = trained_video_run["results_dir"]
    assert rd.name.startswith("video_S01_")  # UI classifies by this prefix
    assert (rd / "best_model.ckpt").exists()
    assert (rd / "final_model.ckpt").exists()
    # per-epoch checkpoints (reference train_video.py:257-262)
    assert (rd / "checkpoint_epoch_1.ckpt").exists()
    assert (rd / "checkpoint_epoch_2.ckpt").exists()
    # calibrated thresholds at BOTH granularities land in every payload
    # (sequence for window decisions, frame for the serving daemon/UI)
    from vad_tpu.utils.checkpoint import load_checkpoint

    for name in ("best_model.ckpt", "final_model.ckpt", "checkpoint_epoch_2.ckpt"):
        ckpt = load_checkpoint(rd / name)
        assert ckpt["score_threshold"] is not None and ckpt["score_threshold"] > 0
        assert ckpt["frame_score_threshold"] is not None
        # frame scores spread wider than their sequence means, so the p99
        # of frames sits at or above the p99 of sequence means
        assert ckpt["frame_score_threshold"] >= ckpt["score_threshold"] * 0.5
        # drift-monitor anchor: frame-score distribution summary whose
        # p99 is, by construction, the frame threshold's quantile family
        base = ckpt["score_baseline"]
        assert base["count"] > 0 and base["p50"] <= base["p99"]
        assert base["p99"] == pytest.approx(
            ckpt["frame_score_threshold"], rel=0.01
        )


def test_video_evaluate_cli(trained_video_run):
    import evaluate_video as ev_cli
    from vad_tpu.eval.video_eval import evaluate

    args = ev_cli.build_parser().parse_args(
        [
            "--checkpoint", str(trained_video_run["results_dir"] / "best_model.ckpt"),
            "--data-dir", str(trained_video_run["data_dir"]),
            "--batch-size", "2",
        ]
    )
    score = evaluate(args)
    assert 0.0 <= score <= 1.0
    out = trained_video_run["results_dir"] / "evaluation"
    assert (out / "score_distribution.png").exists()
    assert (out / "results.txt").exists()
    text = (out / "results.txt").read_text()
    assert "Sequence-level AUROC" in text
    assert "Frame-level AUROC" in text  # synthetic IPAD fixture has labels
    assert "Sequence-level AP (AUPRC)" in text
    assert "Frame-level AP (AUPRC)" in text
    vis = list(out.glob("visualization_*.png"))
    assert len(vis) >= 2


def test_video_evaluate_score_modes(trained_video_run):
    """--score-mode/--score-smooth (temporal analogue of evaluate.py's
    image knobs): max/p99 aggregation over (optionally smoothed) frame
    scores runs end to end and records the mode in results.txt; the
    default path stays the reference's whole-window mean byte format."""
    import evaluate_video as ev_cli
    from vad_tpu.eval.video_eval import evaluate

    base = [
        "--checkpoint", str(trained_video_run["results_dir"] / "best_model.ckpt"),
        "--data-dir", str(trained_video_run["data_dir"]),
        "--batch-size", "2",
    ]
    out = trained_video_run["results_dir"] / "evaluation" / "results.txt"
    score = evaluate(ev_cli.build_parser().parse_args(
        base + ["--score-mode", "max", "--score-smooth", "1.0"]))
    assert 0.0 <= score <= 1.0
    assert "Sequence score mode: max (temporal gaussian sigma=1.0)" in out.read_text()
    # default run afterwards restores the reference byte format
    evaluate(ev_cli.build_parser().parse_args(base))
    assert "Sequence score mode" not in out.read_text()


def test_aggregate_sequence_scores_unit():
    from vad_tpu.eval.video_eval import (
        aggregate_sequence_scores,
        smooth_frame_scores,
    )

    f = np.array([[0.1, 0.1, 0.9, 0.1], [0.2, 0.2, 0.2, 0.2]])
    np.testing.assert_allclose(
        aggregate_sequence_scores(f, "mean"), f.mean(axis=1))
    np.testing.assert_allclose(
        aggregate_sequence_scores(f, "max"), [0.9, 0.2])
    # smoothing spreads the spike but keeps total mass ~constant
    s = smooth_frame_scores(f, sigma=1.0)
    assert s.shape == f.shape
    assert s[0].max() < 0.9 and s[0].max() > f[0].mean()
    np.testing.assert_allclose(s[1], f[1])  # constant row unchanged
    with pytest.raises(ValueError):
        aggregate_sequence_scores(f, "median")


def test_video_evaluate_cli_data_parallel(trained_video_run):
    """--data-parallel (shard_map over the 8-device mesh, batch padded to
    the data-axis size) reproduces the single-device AUROC exactly."""
    import evaluate_video as ev_cli
    from vad_tpu.eval.video_eval import evaluate

    base = [
        "--checkpoint", str(trained_video_run["results_dir"] / "best_model.ckpt"),
        "--data-dir", str(trained_video_run["data_dir"]),
        "--batch-size", "2",
    ]
    plain = evaluate(ev_cli.build_parser().parse_args(base))
    dp = evaluate(ev_cli.build_parser().parse_args(base + ["--data-parallel"]))
    assert dp == plain


def test_video_render_single_file(trained_video_run, tmp_path):
    import cv2

    from vad_tpu.data.synthetic import create_synthetic_video_file
    from vad_tpu.eval.video_eval import load_video_model
    from vad_tpu.eval.video_render import generate_video_output

    clip = create_synthetic_video_file(
        str(tmp_path / "clip.mp4"), n_frames=20, image_size=64,
        anomaly_range=(8, 14),
    )
    model, variables, saved = load_video_model(
        trained_video_run["results_dir"] / "best_model.ckpt"
    )
    out_path = tmp_path / "annotated.mp4"
    scores = generate_video_output(
        model, variables, clip, str(out_path),
        image_size=int(saved["image_size"]),
        sequence_length=int(saved["sequence_length"]),
    )
    assert len(scores) == 20  # every frame scored exactly once
    assert out_path.exists()
    assert (tmp_path / "score_timeline.png").exists()
    cap = cv2.VideoCapture(str(out_path))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    assert n == 20
    assert (w, h) == (64 * 3, 64 + 60)  # 3 panels + score bar


def test_streaming_equals_full_sequence(trained_video_run):
    """Chunked state-carrying inference == one full-sequence forward."""
    from vad_tpu.eval.video_eval import load_video_model
    from vad_tpu.models.video_autoencoder import ConvLSTM, VideoAutoencoder

    model, variables, saved = load_video_model(
        trained_video_run["results_dir"] / "best_model.ckpt"
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 8, 64, 64, 3)), jnp.float32)

    full = model.apply(
        variables, x, per_frame=True, method=VideoAutoencoder.reconstruction_error
    )

    lat = 64 // 16
    states = ConvLSTM.zero_state(2, 1, lat, lat, 32)
    chunks = []
    for i in range(0, 8, 4):
        _, _, fs, states = model.apply(
            variables, x[:, i : i + 4], states, method=VideoAutoencoder.stream_step
        )
        chunks.append(np.asarray(fs))
    streamed = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(streamed, np.asarray(full), rtol=2e-4, atol=1e-6)


def test_evaluate_single_class_test_split(tmp_path):
    """All-normal test split: AUROC gracefully skipped, artifacts written."""
    from vad_tpu.data.synthetic import create_synthetic_video_data
    import shutil
    import train_video as tv_cli
    import evaluate_video as ev_cli
    from vad_tpu.train.video_trainer import train
    from vad_tpu.eval.video_eval import evaluate

    data_dir = tmp_path / "data"
    create_synthetic_video_data(
        str(data_dir), "S02", n_train_videos=1, n_test_videos=2,
        frames_per_video=16, image_size=64,
    )
    # strip the anomaly labels -> every test window normal
    for f in (data_dir / "S02" / "test_label").glob("*.npy"):
        f.unlink()

    args = tv_cli.build_parser().parse_args(
        ["--category", "S02", "--data-dir", str(data_dir), "--image-size", "64",
         "--sequence-length", "8", "--stride", "8", "--latent-dim", "32",
         "--lstm-hidden-dim", "32", "--epochs", "1", "--batch-size", "2",
         "--results-dir", str(tmp_path / "results")]
    )
    out = train(args)
    eargs = ev_cli.build_parser().parse_args(
        ["--checkpoint", str(out["results_dir"] / "best_model.ckpt"),
         "--data-dir", str(data_dir), "--batch-size", "2"]
    )
    score = evaluate(eargs)
    assert score == 0.0  # single class: AUROC not computable, no crash
    text = (out["results_dir"] / "evaluation" / "results.txt").read_text()
    assert "Anomaly: 0" in text


def test_resume_preserves_best_selection(trained_video_run):
    """Post-resume epochs must not clobber a better saved best checkpoint."""
    import train_video as tv_cli
    from vad_tpu.train.video_trainer import train
    from vad_tpu.utils.checkpoint import load_checkpoint

    pre = load_checkpoint(trained_video_run["results_dir"] / "final_model.ckpt")
    pre_best = pre["best_separation"]
    args = tv_cli.build_parser().parse_args(
        ["--category", "S01", "--data-dir", str(trained_video_run["data_dir"]),
         "--image-size", "64", "--sequence-length", "8", "--stride", "8",
         "--latent-dim", "32", "--lstm-hidden-dim", "32", "--lstm-layers", "2",
         "--epochs", "3", "--batch-size", "2", "--num-workers", "2",
         "--results-dir", "unused",
         "--resume", str(trained_video_run["results_dir"] / "final_model.ckpt")]
    )
    out = train(args)
    # history continues (2 pre-resume epochs + 1 more) and the carried
    # best can only improve
    assert len(out["history"]["train_loss"]) == 3
    assert out["best_separation"] >= pre_best
