"""Evaluation artifact rendering: ROC curve, score histograms, recon grids.

Produces the same artifact set and filenames as the reference
(evaluate.py:94-204: roc_curve.png, score_distribution.png,
reconstructions.png) so downstream tooling / the UI results tab keep
working against `<run>/evaluation/`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
except ImportError as e:  # pragma: no cover - exercised only without [full]
    raise ImportError(
        "matplotlib is required for evaluation artifacts — install the full "
        "extra: pip install 'vad-tpu[full]' (or pip install matplotlib)"
    ) from e
import numpy as np

from vad_tpu.eval.metrics import auroc, roc_points


def denormalize(img: np.ndarray) -> np.ndarray:
    """[-1,1] HWC -> [0,1] for display (reference evaluate.py:179-183)."""
    return np.clip(np.asarray(img) * 0.5 + 0.5, 0.0, 1.0)


def _fs(v: Optional[int]) -> Dict:
    return {} if v is None else {"fontsize": v}


def plot_roc_curve(
    labels,
    scores,
    save_path: str | Path,
    *,
    title: str = "ROC Curve - Anomaly Detection",
    fontsize: Optional[Tuple[int, int, int]] = (12, 14, 11),
    diagonal_label: Optional[str] = "Random",
) -> None:
    """ROC artifact shared by the image and video eval paths.

    Defaults reproduce the image styling (reference evaluate.py:94-110);
    the video path passes its own title, no fontsizes, and no diagonal
    label (reference evaluate_video.py:195-212).
    """
    fpr, tpr = roc_points(labels, scores)
    a = auroc(labels, scores)
    ax_fs, title_fs, leg_fs = fontsize if fontsize else (None, None, None)
    plt.figure(figsize=(8, 6))
    plt.plot(fpr, tpr, "b-", linewidth=2, label=f"AUROC = {a:.4f}")
    diag = {"label": diagonal_label} if diagonal_label else {}
    plt.plot([0, 1], [0, 1], "k--", linewidth=1, **diag)
    plt.xlabel("False Positive Rate", **_fs(ax_fs))
    plt.ylabel("True Positive Rate", **_fs(ax_fs))
    plt.title(title, **_fs(title_fs))
    plt.legend(loc="lower right", **_fs(leg_fs))
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    plt.savefig(save_path, dpi=150)
    plt.close()
    print(f"Saved ROC curve to {save_path}")


def plot_score_distribution(
    labels,
    scores,
    save_path: str | Path,
    *,
    xlabel: str = "Reconstruction Error (Anomaly Score)",
    title: str = "Score Distribution: Normal vs Anomaly",
    fontsize: Optional[Tuple[int, int, int]] = (12, 14, 11),
    count_in_label: bool = True,
    plot_empty_anomaly: bool = True,
) -> None:
    """Normal-vs-anomaly histogram shared by the image and video paths.

    Defaults reproduce the image styling (reference evaluate.py:186-204);
    the video path passes plain labels, its own title/xlabel, no fontsizes,
    and skips the anomaly histogram when the class is absent (reference
    evaluate_video.py:214-228).
    """
    labels = np.asarray(labels)
    scores = np.asarray(scores)
    normal = scores[labels == 0]
    anomaly = scores[labels == 1]
    ax_fs, title_fs, leg_fs = fontsize if fontsize else (None, None, None)

    def leg(name, arr):
        return f"{name} (n={len(arr)})" if count_in_label else name

    plt.figure(figsize=(10, 6))
    plt.hist(normal, bins=30, alpha=0.7, label=leg("Normal", normal), color="green")
    if plot_empty_anomaly or len(anomaly) > 0:
        plt.hist(anomaly, bins=30, alpha=0.7, label=leg("Anomaly", anomaly), color="red")
    plt.xlabel(xlabel, **_fs(ax_fs))
    plt.ylabel("Count", **_fs(ax_fs))
    plt.title(title, **_fs(title_fs))
    plt.legend(**_fs(leg_fs))
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    plt.savefig(save_path, dpi=150)
    plt.close()
    print(f"Saved score distribution to {save_path}")


def plot_reconstruction_grid(
    rows: Sequence[Dict],
    save_path: str | Path,
) -> None:
    """N x 4 grid: original | reconstruction | error map ('hot') | GT mask.

    Each row dict: {image, recon, error, mask, defect_type} with image/recon
    in [-1,1] HWC, error [H,W], mask [H,W].  Mirrors reference
    evaluate.py:113-176.
    """
    n = len(rows)
    if n == 0:
        return
    fig, axes = plt.subplots(n, 4, figsize=(16, 4 * n))
    axes = np.atleast_2d(axes)
    for i, row in enumerate(rows):
        axes[i, 0].imshow(denormalize(row["image"]))
        axes[i, 0].set_title(f"Original ({row['defect_type']})", fontsize=10)
        axes[i, 0].axis("off")
        axes[i, 1].imshow(denormalize(row["recon"]))
        axes[i, 1].set_title("Reconstruction", fontsize=10)
        axes[i, 1].axis("off")
        im = axes[i, 2].imshow(row["error"], cmap="hot")
        axes[i, 2].set_title(f"Error Map (score: {float(np.mean(row['error'])):.4f})", fontsize=10)
        axes[i, 2].axis("off")
        fig.colorbar(im, ax=axes[i, 2], fraction=0.046)
        axes[i, 3].imshow(row["mask"], cmap="gray")
        axes[i, 3].set_title("Ground Truth", fontsize=10)
        axes[i, 3].axis("off")
    plt.tight_layout()
    plt.savefig(save_path, dpi=150)
    plt.close()
    print(f"Saved reconstructions to {save_path}")


def plot_training_history(history: Dict[str, list], save_path: str | Path) -> None:
    """Loss + separation curves over epochs (new observability artifact)."""
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 5))
    epochs = np.arange(1, len(history.get("train_loss", [])) + 1)
    ax1.plot(epochs, history.get("train_loss", []), label="train loss")
    ax1.plot(epochs, history.get("val_loss", []), label="val loss")
    ax1.set_xlabel("epoch")
    ax1.set_ylabel("loss")
    ax1.legend()
    ax1.grid(True, alpha=0.3)
    sep = [
        (a / n if n > 0 else 0.0)
        for a, n in zip(history.get("anomaly_err", []), history.get("normal_err", []))
    ]
    ax2.plot(epochs, sep, color="purple", label="separation (anomaly/normal)")
    ax2.axhline(1.0, color="k", linestyle="--", linewidth=1)
    ax2.set_xlabel("epoch")
    ax2.set_ylabel("ratio")
    ax2.legend()
    ax2.grid(True, alpha=0.3)
    plt.tight_layout()
    plt.savefig(save_path, dpi=150)
    plt.close()
