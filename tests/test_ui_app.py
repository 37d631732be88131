"""Execute the gradio widget layer (ui/app.py) end to end via the stub.

The reference's largest file is its runnable UI (main.py:616-828); these
tests run create_ui/launch under tests/gradio_stub.py so every tab is
built and every callback closure executes at least once — a renamed or
re-signatured logic function fails here instead of at runtime.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.gradio_stub import install
from vad_tpu.models.autoencoder import ConvAutoencoder
from vad_tpu.models.video_autoencoder import VideoAutoencoder
from vad_tpu.ui import logic
from vad_tpu.ui.logic import AppState
from vad_tpu.utils.checkpoint import save_checkpoint

EXPECTED_TABS = [
    "Analyze Images",
    "Analyze Video",
    "Train Image Model",
    "Train Video Model",
    "View Results",
    "Help",
]


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    """Tiny real checkpoints for both model families."""
    root = tmp_path_factory.mktemp("results")

    img_dir = root / "synthetic_20260101_000000"
    img_dir.mkdir()
    model = ConvAutoencoder(latent_dim=64)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    save_checkpoint(
        img_dir / "best_model.ckpt",
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
            "epoch": 1,
            "train_loss": 0.01,
            "args": {"latent_dim": 64, "image_size": 64, "category": "synthetic"},
        },
    )

    vid_dir = root / "video_S01_20260101_000000"
    vid_dir.mkdir()
    vmodel = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32, lstm_layers=2)
    vvars = vmodel.init(jax.random.key(1), jnp.zeros((1, 2, 64, 64, 3)), train=False)
    save_checkpoint(
        vid_dir / "best_model.ckpt",
        {
            "params": vvars["params"],
            "batch_stats": vvars["batch_stats"],
            "epoch": 1,
            "separation": 1.2,
            "args": {
                "latent_dim": 32, "lstm_hidden_dim": 32, "lstm_layers": 2,
                "image_size": 64, "sequence_length": 4, "category": "S01",
            },
        },
    )
    return {
        "image": str(img_dir / "best_model.ckpt"),
        "video": str(vid_dir / "best_model.ckpt"),
    }


@pytest.fixture
def ui(monkeypatch):
    rec = install(monkeypatch)
    from vad_tpu.ui import app

    state = AppState()
    blocks = app.create_ui(state)
    return rec, blocks, state


def test_create_ui_builds_six_tabs(ui):
    rec, blocks, _ = ui
    assert rec.tabs == EXPECTED_TABS
    # every tab has at least one component besides the tab itself
    assert len(rec.components) > 30


def test_launch_passes_host_port(monkeypatch):
    rec = install(monkeypatch)
    from vad_tpu.ui import app

    app.launch(host="127.0.0.1", port=7999)
    assert rec.launched == {
        "server_name": "127.0.0.1", "server_port": 7999, "share": False
    }


def test_all_expected_buttons_wired(ui):
    rec, _, _ = ui
    wired = sorted(c["button"].label for c in rec.clicks)
    assert wired == sorted([
        "Refresh", "Refresh", "Refresh",
        "Load Model", "Load Model",
        "Analyze Image", "Analyze Video",
        "Start Training", "Start Video Training",
        "Run Evaluation", "View Existing Results",
    ])
    for c in rec.clicks:
        assert callable(c["fn"]), c["button"].label


def test_refresh_callbacks_return_dropdowns(ui, monkeypatch):
    rec, _, _ = ui
    monkeypatch.setattr(logic, "discover_checkpoints", lambda kind: [f"{kind}.ckpt"])
    for c in rec.clicks_for("Refresh"):
        dd = c["fn"]()
        assert dd.choices in (["image.ckpt"], ["video.ckpt"], ["all.ckpt"])


def test_load_and_analyze_image(ui, checkpoints):
    rec, _, state = ui
    load = rec.clicks_for("Load Model")[0]
    status = load["fn"](checkpoints["image"])
    assert "Model loaded successfully" in status
    assert state.model is not None

    analyze = rec.click_for("Analyze Image")
    img = np.random.default_rng(0).integers(0, 255, (48, 48, 3), dtype=np.uint8)
    recon, heat, report = analyze["fn"](img)
    assert recon.shape == (64, 64, 3) and recon.dtype == np.uint8
    assert heat is not None
    assert "ANALYSIS COMPLETE" in report

    # no-model / no-image error paths
    assert "upload an image" in analyze["fn"](None)[2]


def test_load_and_analyze_video(ui, checkpoints, tmp_path):
    cv2 = pytest.importorskip("cv2")  # noqa: F841 - mp4 rendering needs it
    from vad_tpu.data.synthetic import create_synthetic_video_file

    rec, _, state = ui
    load = rec.clicks_for("Load Model")[1]
    status = load["fn"](checkpoints["video"])
    assert "Video model loaded successfully" in status
    assert state.video_model is not None

    clip = tmp_path / "clip.mp4"
    create_synthetic_video_file(str(clip), n_frames=10, image_size=64, seed=0)
    analyze = rec.click_for("Analyze Video")
    timeline, report = analyze["fn"](str(clip))
    assert timeline is not None
    assert "VIDEO ANALYSIS COMPLETE" in report

    assert "upload a video" in analyze["fn"](None)[1]


def test_training_callbacks_stream(ui, monkeypatch):
    rec, _, _ = ui
    seen = {}

    def fake_stream(cmd, header, tail=40):
        seen["cmd"] = cmd
        yield header + "epoch 1 done"

    monkeypatch.setattr(logic, "stream_subprocess", fake_stream)
    monkeypatch.setattr(logic, "find_data_dir_for_category", lambda c, video=False: "./data")

    train = rec.click_for("Start Training")
    out = list(train["fn"]("synthetic", 10, 8, 0.001, "mse"))
    assert "TRAINING STARTED" in out[-1] and "epoch 1 done" in out[-1]
    assert "train.py" in seen["cmd"][1] and "--loss" in seen["cmd"]

    vtrain = rec.click_for("Start Video Training")
    out = list(vtrain["fn"]("S01", 5, 2, 0.0001))
    assert "VIDEO TRAINING STARTED" in out[-1]
    assert "train_video.py" in seen["cmd"][1]

    # guard branches: no category selected
    assert list(train["fn"]("No datasets found - see Help tab", 1, 1, 0.1, "mse")) == [
        "Error: No dataset found."
    ]
    assert list(vtrain["fn"](None, 1, 1, 0.1)) == ["Error: No video dataset found."]

    monkeypatch.setattr(logic, "find_data_dir_for_category", lambda c, video=False: None)
    assert "Could not find dataset" in list(train["fn"]("x", 1, 1, 0.1, "mse"))[0]
    assert "Could not find video dataset" in list(vtrain["fn"]("x", 1, 1, 0.1))[0]


def test_run_evaluation_callback(ui, checkpoints, monkeypatch, tmp_path):
    rec, _, _ = ui

    def fake_stream(cmd, header, tail=40):
        yield header + "AUROC: 0.95"

    monkeypatch.setattr(logic, "stream_subprocess", fake_stream)
    monkeypatch.setattr(
        logic, "build_eval_command", lambda ckpt: ["python", "evaluate.py"]
    )
    # fabricate an evaluation dir next to the checkpoint
    from pathlib import Path

    eval_dir = Path(checkpoints["image"]).parent / "evaluation"
    eval_dir.mkdir(exist_ok=True)
    (eval_dir / "results.txt").write_text("AUROC: 0.9500\n")

    run_eval = rec.click_for("Run Evaluation")
    status, roc, dist, recon, summary = run_eval["fn"](checkpoints["image"])
    assert "AUROC: 0.95" in status
    assert "AUROC: 0.9500" in summary

    # empty selection branch
    status, *_ = run_eval["fn"]("")
    assert "select a checkpoint" in status

    monkeypatch.setattr(logic, "build_eval_command", lambda ckpt: None)
    status, *_ = run_eval["fn"](checkpoints["image"])
    assert "dataset for this checkpoint not found" in status

    view = rec.click_for("View Existing Results")
    assert view["fn"] is logic.load_results_artifacts
