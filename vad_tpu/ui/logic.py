"""UI business logic, separated from the gradio widget layer.

Everything here is plain-Python and unit-testable without gradio
installed.  Behavior parity with reference main.py:

- checkpoint discovery scans `<results>/*/best_model.ckpt`, classifying
  video models by the `video_` run-dir prefix (main.py:57-75);
- category discovery scans data dirs for MVTec-style `train/` folders and
  IPAD-style `training/frames` trees (main.py:78-124);
- image analysis uses the fixed threshold 0.004 and confidence
  min(|score-threshold|/threshold*100, 100) (main.py:282-285);
- video analysis scores every frame and thresholds at mean + 2*std
  (main.py:357, 375) — here via the state-carrying streaming scorer
  instead of overlapping windows.
"""

from __future__ import annotations

import io
import subprocess
import sys
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

IMAGE_THRESHOLD = 0.004


# ---------------------------------------------------------------- discovery

def discover_checkpoints(model_type: str = "image", results_dir: str = "./results") -> List[str]:
    """best_model.ckpt paths, newest run first, filtered by model type."""
    root = Path(results_dir)
    if not root.exists():
        return []
    out = []
    for folder in sorted(root.iterdir(), reverse=True):
        if not folder.is_dir():
            continue
        best = folder / "best_model.ckpt"
        if not best.exists():
            continue
        is_video = "video_" in folder.name
        if (
            model_type == "all"
            or (model_type == "video" and is_video)
            or (model_type == "image" and not is_video)
        ):
            out.append(str(best))
    return out


def discover_image_categories(data_dirs: Tuple[str, ...] = ("./data", "./data/original")) -> List[str]:
    cats: List[str] = []
    for d in data_dirs:
        root = Path(d)
        if not root.exists():
            continue
        for folder in sorted(root.iterdir()):
            if folder.is_dir() and (folder / "train").exists() and folder.name not in cats:
                cats.append(folder.name)
    return cats or ["No datasets found - see Help tab"]


def discover_video_categories(
    ipad_dir: str = "./data/IPAD", data_dir: str = "./data"
) -> List[str]:
    cats: List[str] = []
    ipad = Path(ipad_dir)
    if ipad.exists():
        for folder in sorted(ipad.iterdir()):
            if folder.is_dir() and (folder / "training" / "frames").exists():
                cats.append(folder.name)
    root = Path(data_dir)
    if root.exists():
        for folder in sorted(root.iterdir()):
            if not folder.is_dir() or folder.name in ("IPAD", "original"):
                continue
            if (folder / "training" / "frames").exists():
                if folder.name not in cats:
                    cats.append(folder.name)
                continue
            train = folder / "train"
            if not train.exists():
                continue
            for sub in train.iterdir():
                if not sub.is_dir():
                    continue
                has_videos = any(
                    f.suffix in (".mp4", ".avi", ".mov") for f in sub.iterdir() if f.is_file()
                )
                has_frames = any(f.is_dir() for f in sub.iterdir())
                if has_videos or has_frames:
                    if folder.name not in cats:
                        cats.append(folder.name)
                    break
    return cats or ["No video datasets found - see Help tab"]


def find_data_dir_for_category(category: str, video: bool = False) -> Optional[str]:
    """Resolve which data root contains the category (main.py:419-424,
    478-484)."""
    if video:
        if (Path("./data/IPAD") / category / "training" / "frames").exists():
            return "./data/IPAD"
        if (Path("./data") / category / "training" / "frames").exists():
            return "./data"
        if (Path("./data") / category / "train").exists():
            return "./data"
        return None
    for root in ("./data", "./data/original"):
        if (Path(root) / category / "train").exists():
            return root
    return None


# ---------------------------------------------------------------- app state

class AppState:
    """Loaded models + metadata across UI interactions (main.py:33-50)."""

    def __init__(self) -> None:
        self.model = None
        self.variables = None
        self.model_args: dict = {}
        self.video_model = None
        self.video_variables = None
        self.video_args: dict = {}
        # calibrated thresholds from the checkpoints when present (p99 of
        # validation normal scores); None falls back to the reference's
        # fixed IMAGE_THRESHOLD (main.py:283) / mean+2*std (main.py:357)
        self.score_threshold = None
        self.video_score_threshold = None

    def load_image_model(self, checkpoint_path: str) -> str:
        if not checkpoint_path or not Path(checkpoint_path).exists():
            return "Error: Checkpoint file not found."
        try:
            from vad_tpu.eval.image_eval import load_image_model

            self.model, self.variables, self.model_args = load_image_model(checkpoint_path)
            from vad_tpu.utils.checkpoint import load_checkpoint

            ckpt = load_checkpoint(checkpoint_path)
            self.score_threshold = ckpt.get("score_threshold")
            thr_line = (
                f"- Calibrated threshold: {self.score_threshold:.6f} "
                f"({ckpt.get('threshold_method', 'calibrated')})\n"
                if self.score_threshold is not None else ""
            )
            return (
                "Model loaded successfully.\n\n"
                f"Details:\n"
                f"- Epoch: {ckpt.get('epoch', 'unknown')}\n"
                f"- Training Loss: {ckpt.get('train_loss', 0) or 0:.6f}\n"
                f"- Category: {self.model_args.get('category', 'unknown')}\n"
                f"{thr_line}"
                f"- Backend: JAX/TPU"
            )
        except Exception as e:  # noqa: BLE001 - shown in the UI
            return f"Error loading model: {e}"

    def load_video_model(self, checkpoint_path: str) -> str:
        if not checkpoint_path or not Path(checkpoint_path).exists():
            return "Error: Checkpoint file not found."
        try:
            from vad_tpu.eval.video_eval import load_video_model
            from vad_tpu.utils.checkpoint import load_checkpoint

            self.video_model, self.video_variables, self.video_args = load_video_model(
                checkpoint_path
            )
            ckpt = load_checkpoint(checkpoint_path)
            # the UI's video analysis scores PER FRAME (stream_scores), so
            # the frame-granularity threshold is the comparable one; the
            # sequence-level score_threshold would over-flag normal frames
            self.video_score_threshold = ckpt.get("frame_score_threshold")
            return (
                "Video model loaded successfully.\n\n"
                f"Details:\n"
                f"- Epoch: {ckpt.get('epoch', 'unknown')}\n"
                f"- Separation Ratio: {ckpt.get('separation', 0) or 0:.2f}x\n"
                f"- Category: {self.video_args.get('category', 'unknown')}\n"
                f"- Sequence Length: {self.video_args.get('sequence_length', 16)} frames\n"
                f"- Backend: JAX/TPU"
            )
        except Exception as e:  # noqa: BLE001
            return f"Error loading video model: {e}"


# ---------------------------------------------------------------- analysis

def image_report(score: float, threshold: float = IMAGE_THRESHOLD) -> str:
    is_anomaly = score > threshold
    status = "ANOMALY DETECTED" if is_anomaly else "NORMAL"
    confidence = min(abs(score - threshold) / threshold * 100, 100)
    return (
        f"ANALYSIS COMPLETE\n{'=' * 60}\n\n"
        f"Status: {status}\n"
        f"Anomaly Score: {score:.6f}\n"
        f"Threshold: {threshold:.6f}\n"
        f"Confidence: {confidence:.1f}%\n\n"
        f"{'=' * 60}\nINTERPRETATION\n\n"
        + ("WARNING: Anomaly detected." if is_anomaly else "Image appears normal.")
    )


def analyze_image(state: AppState, image_array: np.ndarray, image_size: int = 256):
    """(recon uint8 HWC, heatmap PIL, report str) for an uploaded image."""
    import jax
    import jax.numpy as jnp
    from PIL import Image


    if state.model is None:
        return None, None, "Please load a model first."
    if image_array is None:
        return None, None, "Please upload an image to analyze."

    img = Image.fromarray(np.asarray(image_array)).convert("RGB")
    size = int(state.model_args.get("image_size", image_size))
    img = img.resize((size, size), Image.BILINEAR)
    x_np = np.asarray(img, np.float32)[None] / 127.5 - 1.0

    # one model forward; error map and scalar score derive from it on host
    recon = np.asarray(state.model.apply(state.variables, jnp.asarray(x_np), train=False))
    err_map = np.mean(np.square(x_np[0] - recon[0]), axis=-1)
    score = float(err_map.mean())

    recon_u8 = (np.clip(recon[0] * 0.5 + 0.5, 0, 1) * 255).astype(np.uint8)
    heat = _heatmap_image(err_map)
    threshold = (
        state.score_threshold if state.score_threshold is not None
        else IMAGE_THRESHOLD
    )
    return recon_u8, heat, image_report(score, threshold)


def _heatmap_image(error_map: np.ndarray):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    fig, ax = plt.subplots(figsize=(4, 4))
    im = ax.imshow(error_map, cmap="hot")
    ax.axis("off")
    plt.colorbar(im, ax=ax, fraction=0.046)
    plt.tight_layout()
    buf = io.BytesIO()
    plt.savefig(buf, format="png", dpi=100, bbox_inches="tight")
    buf.seek(0)
    plt.close(fig)
    return Image.open(buf)


def video_report(scores: np.ndarray, calibrated: float | None = None) -> str:
    """Reference-parity report (mean+2*std self-threshold, main.py:357) —
    plus, when the checkpoint carries one, the calibrated threshold from
    held-out NORMAL training data, which unlike the self-threshold does
    not shift with the anomaly content of the analyzed clip."""
    mean = float(np.mean(scores))
    mx = float(np.max(scores))
    threshold = mean + 2 * float(np.std(scores))
    anomaly_frames = np.where(scores > threshold)[0]
    calib_lines = ""
    if calibrated is not None:
        n_cal = int(np.sum(scores > calibrated))
        calib_lines = (
            f"- Calibrated Threshold (p99 normal): {calibrated:.6f}\n"
            f"- Frames Above Calibrated Threshold: {n_cal} "
            f"({100 * n_cal / max(len(scores), 1):.1f}%)\n"
        )
    text = (
        f"VIDEO ANALYSIS COMPLETE\n{'=' * 60}\n\n"
        f"Video Statistics:\n"
        f"- Total Frames Analyzed: {len(scores)}\n"
        f"- Mean Anomaly Score: {mean:.6f}\n"
        f"- Max Anomaly Score: {mx:.6f}\n"
        f"- Threshold (mean + 2*std): {threshold:.6f}\n"
        f"{calib_lines}\n"
        f"Anomaly Detection:\n"
        f"- Frames Above Threshold: {len(anomaly_frames)}\n"
        f"- Anomaly Percentage: {100 * len(anomaly_frames) / max(len(scores), 1):.1f}%\n\n"
        f"{'=' * 60}\n"
    )
    if len(anomaly_frames) > 0:
        text += f"\nPotential anomaly frames: {anomaly_frames[:20].tolist()}"
        if len(anomaly_frames) > 20:
            text += f"\n... and {len(anomaly_frames) - 20} more"
    else:
        text += "\nNo significant anomalies detected."
    return text


def analyze_video(state: AppState, video_path: str):
    """(timeline PIL, report) for an uploaded video, scored per frame."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    from vad_tpu.eval.video_render import stream_scores

    if state.video_model is None:
        return None, "Please load a video model first."
    if video_path is None:
        return None, "Please upload a video file."
    try:
        image_size = int(state.video_args.get("image_size", 256))
        seq = int(state.video_args.get("sequence_length", 16))
        scores = stream_scores(
            state.video_model, state.video_variables, video_path, image_size, chunk=seq,
            objective=state.video_args.get("objective", "reconstruct") or "reconstruct",
        )
        if len(scores) == 0:
            return None, "Video too short for analysis."

        fig, ax = plt.subplots(figsize=(12, 4))
        ax.plot(scores, "b-", linewidth=1)
        ax.axhline(
            y=float(np.mean(scores) + 2 * np.std(scores)),
            color="r",
            linestyle="--",
            label="Threshold",
        )
        ax.set_xlabel("Frame")
        ax.set_ylabel("Anomaly Score")
        ax.set_title("Video Anomaly Score Timeline")
        ax.legend()
        ax.grid(True, alpha=0.3)
        plt.tight_layout()
        buf = io.BytesIO()
        plt.savefig(buf, format="png", dpi=150)
        buf.seek(0)
        plt.close(fig)
        return Image.open(buf), video_report(
            np.asarray(scores), calibrated=state.video_score_threshold
        )
    except Exception as e:  # noqa: BLE001
        return None, f"Error analyzing video: {e}"


# ---------------------------------------------------------------- training

def build_train_command(
    category: str, epochs: int, batch_size: int, lr: float, loss: str, data_dir: str
) -> List[str]:
    return [
        sys.executable, "train.py",
        "--category", category,
        "--data-dir", data_dir,
        "--epochs", str(int(epochs)),
        "--batch-size", str(int(batch_size)),
        "--lr", str(lr),
        "--loss", loss,
    ]


def build_video_train_command(
    category: str, epochs: int, batch_size: int, lr: float, data_dir: str
) -> List[str]:
    return [
        sys.executable, "train_video.py",
        "--category", category,
        "--data-dir", data_dir,
        "--epochs", str(int(epochs)),
        "--batch-size", str(int(batch_size)),
        "--lr", str(lr),
    ]


def stream_subprocess(cmd: List[str], header: str, tail: int = 40) -> Iterator[str]:
    """Run a CLI, yielding header + the rolling last ``tail`` output lines
    (the reference's live-training-log pattern, main.py:452-463)."""
    yield header + "Initializing...\n"
    try:
        process = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, bufsize=1
        )
        lines: List[str] = []
        assert process.stdout is not None
        for line in process.stdout:
            line = line.strip()
            if line:
                lines.append(line)
                yield header + "\n".join(lines[-tail:])
        process.wait()
        yield header + "\n".join(lines[-tail:]) + "\n\nCOMPLETE"
    except Exception as e:  # noqa: BLE001
        yield f"Error: {e}"


def load_results_artifacts(checkpoint_path: str):
    """(roc, dist, recon, results_text) from `<run>/evaluation/`
    (main.py:533-559)."""
    from PIL import Image

    if not checkpoint_path:
        return None, None, None, "Please select a checkpoint first."
    eval_dir = Path(checkpoint_path).parent / "evaluation"
    if not eval_dir.exists():
        return None, None, None, "No evaluation results found. Run evaluation first."

    def img(name):
        p = eval_dir / name
        return Image.open(p) if p.exists() else None

    recon = img("reconstructions.png")
    if recon is None:
        vis = sorted(eval_dir.glob("visualization_*.png"))
        recon = Image.open(vis[0]) if vis else None
    results_path = eval_dir / "results.txt"
    text = results_path.read_text() if results_path.exists() else "No results.txt found."
    return img("roc_curve.png"), img("score_distribution.png"), recon, text


def build_eval_command(checkpoint_path: str) -> Optional[List[str]]:
    """Pick evaluate.py vs evaluate_video.py by run-dir prefix and resolve
    the data dir from the checkpoint args (main.py:562-592)."""
    from vad_tpu.utils.checkpoint import load_checkpoint

    is_video = "video_" in Path(checkpoint_path).parent.name
    ckpt = load_checkpoint(checkpoint_path)
    category = ckpt.get("args", {}).get("category", "synthetic")
    stored_dir = ckpt.get("args", {}).get("data_dir")
    data_dir = (
        stored_dir
        if stored_dir and Path(stored_dir, category).exists()
        else find_data_dir_for_category(category, video=is_video)
    )
    if data_dir is None:
        return None
    script = "evaluate_video.py" if is_video else "evaluate.py"
    return [
        sys.executable, script,
        "--checkpoint", checkpoint_path,
        "--data-dir", data_dir,
        "--category", category,
    ]
