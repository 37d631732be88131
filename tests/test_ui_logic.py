"""UI business-logic tests (no gradio required)."""

import numpy as np
import pytest

from vad_tpu.ui import logic


class TestDiscovery:
    def test_checkpoint_classification(self, tmp_path):
        for name in ("bottle_20260101_000000", "video_S01_20260101_000000", "empty_run"):
            (tmp_path / name).mkdir()
        (tmp_path / "bottle_20260101_000000" / "best_model.ckpt").write_bytes(b"x")
        (tmp_path / "video_S01_20260101_000000" / "best_model.ckpt").write_bytes(b"x")

        image = logic.discover_checkpoints("image", str(tmp_path))
        video = logic.discover_checkpoints("video", str(tmp_path))
        allc = logic.discover_checkpoints("all", str(tmp_path))
        assert len(image) == 1 and "bottle" in image[0]
        assert len(video) == 1 and "video_S01" in video[0]
        assert len(allc) == 2  # empty_run has no best_model.ckpt

    def test_missing_results_dir(self):
        assert logic.discover_checkpoints("all", "/nonexistent") == []

    def test_image_categories(self, tmp_path):
        (tmp_path / "bottle" / "train").mkdir(parents=True)
        (tmp_path / "no_train_dir").mkdir()
        cats = logic.discover_image_categories((str(tmp_path),))
        assert cats == ["bottle"]

    def test_image_categories_placeholder(self, tmp_path):
        cats = logic.discover_image_categories((str(tmp_path / "missing"),))
        assert cats[0].startswith("No datasets")

    def test_video_categories_ipad_and_generic(self, tmp_path):
        ipad = tmp_path / "IPAD" / "S01" / "training" / "frames"
        ipad.mkdir(parents=True)
        gen = tmp_path / "conveyor" / "train" / "normal" / "vid01"
        gen.mkdir(parents=True)
        cats = logic.discover_video_categories(
            str(tmp_path / "IPAD"), str(tmp_path)
        )
        assert "S01" in cats and "conveyor" in cats


class TestReports:
    def test_image_report_normal_vs_anomaly(self):
        normal = logic.image_report(0.001)
        anomalous = logic.image_report(0.05)
        assert "NORMAL" in normal and "Anomaly Score: 0.001000" in normal
        assert "ANOMALY DETECTED" in anomalous
        # confidence saturates at 100
        assert "Confidence: 100.0%" in anomalous

    def test_image_report_threshold_formula(self):
        # score 0.006 vs threshold 0.004 -> |0.002|/0.004*100 = 50%
        rep = logic.image_report(0.006)
        assert "Confidence: 50.0%" in rep

    def test_video_report_threshold(self):
        scores = np.concatenate([np.full(90, 0.001), np.full(10, 0.01)])
        rep = logic.video_report(scores)
        assert "Total Frames Analyzed: 100" in rep
        assert "Frames Above Threshold: 10" in rep
        assert "Anomaly Percentage: 10.0%" in rep

    def test_video_report_calibrated_threshold(self):
        scores = np.asarray([0.01, 0.02, 0.5])
        rep = logic.video_report(scores, calibrated=0.05)
        assert "Calibrated Threshold (p99 normal): 0.050000" in rep
        assert "Frames Above Calibrated Threshold: 1 (33.3%)" in rep
        # without a calibrated threshold the reference-parity report stands
        assert "Calibrated" not in logic.video_report(scores)

    def test_video_report_no_anomalies(self):
        rng = np.random.default_rng(0)
        rep = logic.video_report(rng.normal(0.001, 1e-5, size=50))
        assert "Potential anomaly frames" in rep or "No significant anomalies" in rep


class TestCommands:
    def test_train_command(self):
        cmd = logic.build_train_command("bottle", 50, 16, 1e-3, "mse", "./data")
        assert "train.py" in cmd[1]
        assert cmd[cmd.index("--category") + 1] == "bottle"
        assert cmd[cmd.index("--loss") + 1] == "mse"

    def test_video_train_command(self):
        cmd = logic.build_video_train_command("S01", 10, 4, 1e-4, "./data/IPAD")
        assert "train_video.py" in cmd[1]
        assert cmd[cmd.index("--data-dir") + 1] == "./data/IPAD"

    def test_eval_command_picks_script(self, tmp_path):
        from vad_tpu.utils.checkpoint import save_checkpoint

        img_run = tmp_path / "bottle_x"
        vid_run = tmp_path / "video_S01_x"
        img_run.mkdir()
        vid_run.mkdir()
        data = tmp_path / "data" / "bottle" / "train"
        data.mkdir(parents=True)
        args = {"category": "bottle", "data_dir": str(tmp_path / "data")}
        save_checkpoint(img_run / "best_model.ckpt", {"args": args})
        save_checkpoint(vid_run / "best_model.ckpt", {"args": args})
        icmd = logic.build_eval_command(str(img_run / "best_model.ckpt"))
        vcmd = logic.build_eval_command(str(vid_run / "best_model.ckpt"))
        assert "evaluate.py" in icmd[1]
        assert "evaluate_video.py" in vcmd[1]


class TestAppStateAnalysis:
    def test_analyze_image_without_model(self):
        state = logic.AppState()
        _, _, msg = logic.analyze_image(state, np.zeros((10, 10, 3), np.uint8))
        assert "load a model" in msg

    def test_analyze_video_without_model(self):
        state = logic.AppState()
        _, msg = logic.analyze_video(state, "whatever.mp4")
        assert "load a video model" in msg

    def test_full_image_analysis_via_state(self, tmp_path, synthetic_image_root):
        """Train 1 epoch, load via AppState, analyze an uploaded image."""
        import train as train_cli
        from vad_tpu.train.image_trainer import train
        from PIL import Image

        args = train_cli.build_parser().parse_args(
            [
                "--category", "synthetic", "--data-dir", synthetic_image_root,
                "--image-size", "64", "--latent-dim", "32", "--epochs", "1",
                "--batch-size", "8", "--num-workers", "0",
                "--results-dir", str(tmp_path / "results"),
            ]
        )
        out = train(args)
        state = logic.AppState()
        msg = state.load_image_model(str(out["results_dir"] / "best_model.ckpt"))
        assert "loaded successfully" in msg
        img = np.asarray(
            Image.open(f"{synthetic_image_root}/synthetic/test/defect/000.png")
        )
        recon, heat, report = logic.analyze_image(state, img)
        assert recon.shape == (64, 64, 3)
        assert heat is not None
        assert "Anomaly Score:" in report
        # the trained checkpoint carries a calibrated threshold; the UI
        # surfaces it at load and uses it in the report instead of the
        # reference's fixed 0.004
        assert "Calibrated threshold:" in msg
        assert state.score_threshold is not None
        assert f"Threshold: {state.score_threshold:.6f}" in report

    def test_load_results_artifacts_missing(self, tmp_path):
        run = tmp_path / "run"
        run.mkdir()
        (run / "best_model.ckpt").write_bytes(b"x")
        _, _, _, text = logic.load_results_artifacts(str(run / "best_model.ckpt"))
        assert "Run evaluation first" in text
