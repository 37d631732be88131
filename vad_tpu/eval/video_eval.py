"""Video-model evaluation: dataset mode (AUROC) and artifacts.

Behavior parity with reference evaluate_video.py:69-306: rebuild from
checkpoint args, score non-overlapping windows (stride = sequence_length),
sequence-level AUROC + frame-level AUROC when per-frame labels exist,
score statistics + separation, roc/distribution plots, per-sample
side-by-side visualization PNGs, and results.txt.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from vad_tpu.data.loader import Loader
from vad_tpu.data.video_dataset import detect_video_dataset_class
from vad_tpu.eval.metrics import auroc, average_precision
from vad_tpu.eval.plots import plot_roc_curve, plot_score_distribution, plt
from vad_tpu.models.video_autoencoder import VideoAutoencoder
from vad_tpu.parallel.sharding import data_parallel_jit, pad_batch_for_devices
from vad_tpu.utils.checkpoint import load_checkpoint


SCORE_MODES = ("mean", "max", "p99")


def smooth_frame_scores(frame_scores: np.ndarray, sigma: float) -> np.ndarray:
    """Gaussian-smooth per-frame scores [B, T] along TIME (sigma in
    frames; edge-replicated).  The temporal analogue of the image path's
    spatial smoothing (image_eval.smooth_error_map): averages out
    single-frame scoring noise so max/p99 aggregation responds to
    sustained anomalous segments rather than one flickering frame."""
    size = max(3, int(2 * round(2 * sigma) + 1))
    x = np.arange(size, dtype=np.float64) - size // 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    pad = size // 2
    fp = np.pad(np.asarray(frame_scores, np.float64), ((0, 0), (pad, pad)),
                mode="edge")
    return np.stack([np.convolve(row, k, mode="valid") for row in fp])


def aggregate_sequence_scores(
    frame_scores: np.ndarray, score_mode: str = "mean",
    score_smooth: float = 0.0,
) -> np.ndarray:
    """Per-frame scores [B, T] -> sequence scores [B].

    'mean' is the reference's definition (its video score is the mean
    error over the whole window, evaluate_video.py:69-306); 'max'/'p99'
    (beyond-reference, mirroring evaluate.py --score-mode) key on the
    WORST frames — anomalies localized in time (a brief intrusion in a
    long window) are diluted by a whole-window mean but stand out to a
    peak statistic, especially with smoothing suppressing one-frame
    noise first."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}, got {score_mode!r}")
    f = np.asarray(frame_scores, np.float64)
    if score_smooth > 0:
        f = smooth_frame_scores(f, score_smooth)
    if score_mode == "max":
        return f.max(axis=1)
    if score_mode == "p99":
        return np.quantile(f, 0.99, axis=1)
    return f.mean(axis=1)


def denormalize_u8(arr: np.ndarray) -> np.ndarray:
    """[-1,1] float -> [0,255] uint8 (reference evaluate_video.py:40-48)."""
    return (np.clip(np.asarray(arr) * 0.5 + 0.5, 0.0, 1.0) * 255).astype(np.uint8)


def create_heatmap(error_map: np.ndarray, size=None) -> np.ndarray:
    """Error map -> JET RGB heatmap (reference evaluate_video.py:51-66)."""
    e = np.asarray(error_map, dtype=np.float32)
    e = (e - e.min()) / (e.max() - e.min() + 1e-8)
    u8 = (e * 255).astype(np.uint8)
    hm = cv2.applyColorMap(u8, cv2.COLORMAP_JET)
    hm = cv2.cvtColor(hm, cv2.COLOR_BGR2RGB)
    if size:
        hm = cv2.resize(hm, size)
    return hm


def load_video_model(checkpoint_path: str | Path) -> Tuple[VideoAutoencoder, Dict, Dict]:
    from vad_tpu.core.config import VideoAEConfig

    from vad_tpu.ops.convlstm_pallas import preferred_backend

    ckpt = load_checkpoint(checkpoint_path)
    saved = ckpt.get("args", {})
    cfg = VideoAEConfig.from_args(saved)
    lat = cfg.image_size // 16
    model = VideoAutoencoder(
        in_channels=cfg.in_channels,
        latent_dim=cfg.latent_dim,
        lstm_hidden_dim=cfg.lstm_hidden_dim,
        lstm_layers=cfg.lstm_layers,
        backend=preferred_backend(lat, lat, cfg.lstm_hidden_dim),
        norm=cfg.norm,
        stem=cfg.stem,
    )
    variables = {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats") or {}}
    print(f"Loaded model from epoch {ckpt.get('epoch', 'unknown')}")
    print(f"Training loss: {ckpt.get('train_loss', 0) or 0:.6f}")
    return model, variables, saved


def evaluate(args: Any) -> float:
    devs = jax.devices()
    print(f"Using device: {devs[0].platform}:{devs[0].device_kind}")

    model, variables, saved = load_video_model(args.checkpoint)
    category = args.category or saved.get("category", "S01")
    sequence_length = int(saved.get("sequence_length", 16))
    image_size = int(saved.get("image_size", 256))

    print(f"\nEvaluating on category: {category}")
    DatasetClass = detect_video_dataset_class(args.data_dir, category)
    test_ds = DatasetClass(
        args.data_dir,
        category,
        "test",
        sequence_length=sequence_length,
        stride=sequence_length,  # non-overlapping for evaluation
        image_size=image_size,
    )
    print(f"Test sequences: {len(test_ds)}")

    mesh = None
    batch_size = args.batch_size
    if getattr(args, "data_parallel", False):
        from vad_tpu.parallel.sharding import get_mesh, padded_batch_size

        mesh = get_mesh()
        batch_size = padded_batch_size(batch_size, mesh)
        print(f"Data-parallel evaluation over {mesh.shape['data']} devices")
    loader = Loader(test_ds, batch_size, num_workers=2)

    objective = saved.get("objective", "reconstruct") or "reconstruct"
    scorer = getattr(args, "scorer", "recon") or "recon"
    window_maps_fn = None
    if scorer == "latent":
        # Latent-distance scoring (eval/latent_score.py): fit per-position
        # Gaussians on the normal training split's frames, score test
        # windows by per-frame Mahalanobis maps.  Purely spatial (the
        # ConvLSTM plays no role), so it also ignores --objective.
        from vad_tpu.eval.latent_score import (
            fit_or_load,
            make_distance_fn,
            stats_state,
            upsample_maps,
        )

        train_ds = DatasetClass(
            args.data_dir,
            category,
            "train",
            sequence_length=sequence_length,
            stride=sequence_length,
            image_size=image_size,
        )
        load_path = getattr(args, "latent_stats", None)
        if not load_path:
            print(
                f"Latent-distance scorer: fitting per-position Gaussians on "
                f"{len(train_ds)} normal training windows..."
            )
        else:
            print("Latent-distance scorer:")

        def pyramid_fn(v, frames):
            return model.apply(v, frames, method=VideoAutoencoder.feature_pyramid)

        def _frame_batches():
            for b in Loader(train_ds, batch_size, num_workers=2):
                fr = b["frames"]
                yield fr.reshape(-1, *fr.shape[2:])  # [B*T, H, W, C]

        eval_dir_early = Path(args.checkpoint).parent / "evaluation"
        eval_dir_early.mkdir(exist_ok=True)
        stats = fit_or_load(
            pyramid_fn,
            variables,
            _frame_batches(),
            proj_dim=int(getattr(args, "latent_proj_dim", 128) or 128),
            grid=getattr(args, "latent_grid", None),
            seed=0,
            save_path=eval_dir_early / "latent_stats.npz",
            load_path=load_path,
            what="frames",
        )
        # fitted statistics ride through the jit as a runtime argument,
        # never a closure constant (latent_score.stats_state explains why)
        scorer_state = stats_state(stats)
        dfn = make_distance_fn(pyramid_fn, stats.layers, stats.grid)

        def score_step(vs, x):
            v, state = vs
            flat = x.reshape(-1, *x.shape[2:])
            maps = dfn(v, state, flat)
            frame = jnp.mean(maps, axis=(1, 2)).reshape(x.shape[0], x.shape[1])
            return jnp.mean(frame, axis=1), frame

        def window_maps_fn(v, state, x):
            flat = x.reshape(-1, *x.shape[2:])
            maps = upsample_maps(dfn(v, state, flat), x.shape[2])
            return maps.reshape(*x.shape[:2], *maps.shape[1:])

    else:
        scorer_state = None
        score_method = (
            VideoAutoencoder.prediction_error
            if objective == "predict"
            else VideoAutoencoder.reconstruction_error
        )
        if objective == "predict":
            print("Scoring objective: future-frame prediction error")

        def score_step(vs, x):
            v, _ = vs
            seq = model.apply(v, x, method=score_method)
            frame = model.apply(v, x, per_frame=True, method=score_method)
            return seq, frame

    score_step = data_parallel_jit(score_step, mesh)

    score_mode = getattr(args, "score_mode", None) or "mean"
    score_smooth = float(getattr(args, "score_smooth", 0.0) or 0.0)
    custom_agg = score_mode != "mean" or score_smooth > 0
    if custom_agg:
        print(f"Sequence score: {score_mode} over frame scores"
              + (f" (temporal gaussian sigma={score_smooth})"
                 if score_smooth > 0 else ""))

    all_scores, all_labels = [], []
    frame_scores, frame_labels = [], []
    has_frame_labels = getattr(test_ds, "has_frame_labels", False)
    print("\nComputing anomaly scores...")
    for batch in loader:
        padded, n_real = pad_batch_for_devices({"frames": batch["frames"]}, batch_size)
        seq, frame = score_step((variables, scorer_state), padded["frames"])
        if custom_agg:
            # derive the window score from per-frame scores (reference
            # parity path keeps the model's own whole-window mean)
            seq = aggregate_sequence_scores(
                np.asarray(frame)[:n_real], score_mode, score_smooth
            )
        all_scores.extend(np.asarray(seq)[:n_real].tolist())
        all_labels.extend(np.asarray(batch["label"]).tolist())
        if has_frame_labels:
            f = np.asarray(frame)[:n_real]
            if score_smooth > 0:
                # frame metrics see the same smoothed scores the
                # aggregation used
                f = smooth_frame_scores(f, score_smooth)
            frame_scores.extend(f.reshape(-1).tolist())
            fl = np.asarray(batch["frame_labels"])
            if objective == "predict" and scorer != "latent":
                fl = fl[:, 1:]  # prediction scores align to frames 1..T-1
            frame_labels.extend(fl.reshape(-1).tolist())

    all_scores = np.array(all_scores)
    all_labels = np.array(all_labels)

    print("\n" + "=" * 50)
    seq_ap = None
    if len(np.unique(all_labels)) > 1:
        a = auroc(all_labels, all_scores)
        seq_ap = average_precision(all_labels, all_scores)
        print(f"Sequence-level AUROC: {a:.4f}")
        print(f"Sequence-level AP (AUPRC): {seq_ap:.4f}")
    else:
        a = 0.0
        print("Cannot compute AUROC - only one class present")

    frame_auroc = None
    frame_ap = None
    if frame_scores and frame_labels and len(np.unique(frame_labels)) > 1:
        frame_auroc = auroc(np.array(frame_labels), np.array(frame_scores))
        frame_ap = average_precision(np.array(frame_labels), np.array(frame_scores))
        print(f"Frame-level AUROC: {frame_auroc:.4f}")
        print(f"Frame-level AP (AUPRC): {frame_ap:.4f}")

    normal = all_scores[all_labels == 0]
    anomaly = all_scores[all_labels == 1]
    print("=" * 50)
    print("\nScore Statistics:")
    print(f"  Normal  - mean: {normal.mean():.6f}, std: {normal.std():.6f}")
    if len(anomaly) > 0:
        print(f"  Anomaly - mean: {anomaly.mean():.6f}, std: {anomaly.std():.6f}")
        print(f"  Separation ratio: {anomaly.mean() / normal.mean():.2f}x")

    eval_dir = Path(args.checkpoint).parent / "evaluation"
    eval_dir.mkdir(exist_ok=True)

    if len(np.unique(all_labels)) > 1:
        print()
        plot_roc_curve(
            all_labels,
            all_scores,
            eval_dir / "roc_curve.png",
            title=f"ROC Curve - Video Anomaly Detection\n{category}",
            fontsize=None,
            diagonal_label=None,
        )

    plot_score_distribution(
        all_labels,
        all_scores,
        eval_dir / "score_distribution.png",
        xlabel="Anomaly Score",
        title=f"Score Distribution - {category}",
        fontsize=None,
        count_in_label=False,
        plot_empty_anomaly=False,
    )

    print("\nGenerating visualizations...")
    generate_visualizations(
        model, variables, test_ds, eval_dir, num_samples=4,
        # latent maps align 1:1 with frames, so no predict-mode offset
        objective=("reconstruct" if scorer == "latent" else objective),
        window_maps_fn=window_maps_fn, scorer_state=scorer_state,
    )

    with open(eval_dir / "results.txt", "w") as f:
        f.write("Video Anomaly Detection Evaluation\n")
        f.write("=" * 50 + "\n\n")
        f.write(f"Category: {category}\n")
        if scorer != "recon":  # defaults keep the reference's byte format
            f.write(f"Scorer: {scorer}\n")
        if custom_agg:
            f.write(f"Sequence score mode: {score_mode}"
                    + (f" (temporal gaussian sigma={score_smooth})"
                       if score_smooth > 0 else "") + "\n")
        f.write(f"Sequence-level AUROC: {a:.4f}\n")
        if frame_auroc is not None:
            f.write(f"Frame-level AUROC: {frame_auroc:.4f}\n")
        if seq_ap is not None:
            f.write(f"Sequence-level AP (AUPRC): {seq_ap:.4f}\n")
        if frame_ap is not None:
            f.write(f"Frame-level AP (AUPRC): {frame_ap:.4f}\n")
        f.write(f"Test sequences: {len(test_ds)}\n")
        f.write(f"  Normal: {len(normal)}\n")
        f.write(f"  Anomaly: {len(anomaly)}\n\n")
        f.write("Score Statistics:\n")
        f.write(f"  Normal mean: {normal.mean():.6f}\n")
        if len(anomaly) > 0:
            f.write(f"  Anomaly mean: {anomaly.mean():.6f}\n")
            f.write(f"  Separation: {anomaly.mean() / normal.mean():.2f}x\n")

    print(f"\nResults saved to: {eval_dir}")
    return a


def generate_visualizations(
    model, variables, dataset, output_dir: Path, num_samples: int = 4,
    objective: str = "reconstruct", window_maps_fn=None, scorer_state=None,
):
    """Side-by-side PNGs (original | reconstruction | heatmap) for the
    middle frame of a few normal/anomalous windows (reference
    evaluate_video.py:251-306).  For predict-trained checkpoints the
    heatmap/score use prediction error (output t vs frame t+1), matching
    the metrics.  ``window_maps_fn(v, x) -> [B, T, H, W]`` (the latent
    scorer path) replaces the heatmap and score source so artifacts match
    the metrics in results.txt; the middle panel stays the decoder
    output."""
    labels = dataset.labels
    normal_idx = [i for i, l in enumerate(labels) if l == 0][: num_samples // 2]
    anomaly_idx = [i for i, l in enumerate(labels) if l == 1][: num_samples // 2]
    selected = normal_idx + anomaly_idx
    if not selected:
        selected = list(range(min(num_samples, len(dataset))))

    err_method = (
        VideoAutoencoder.prediction_error
        if objective == "predict"
        else VideoAutoencoder.reconstruction_error
    )

    @jax.jit
    def forward(vs, x):
        v, state = vs
        recon = model.apply(v, x, train=False)
        if window_maps_fn is not None:
            err = window_maps_fn(v, state, x)
            seq = jnp.mean(err, axis=(1, 2, 3))
        else:
            err = model.apply(v, x, per_pixel=True, method=err_method)
            seq = model.apply(v, x, method=err_method)
        return recon, err, seq

    for idx in selected:
        sample = dataset[idx]
        frames = jnp.asarray(sample["frames"][None])
        label = int(sample["label"])
        label_name = "ANOMALY" if label == 1 else "NORMAL"
        recon, err, seq = forward((variables, scorer_state), frames)

        t_mid = err.shape[1] // 2  # err is [1, T-1, ...] in predict mode
        # predict mode: panel shows frame t_mid+1, its prediction recon[t_mid]
        t_show = t_mid + 1 if objective == "predict" else t_mid
        t_rec = t_mid if objective == "predict" else t_mid
        orig = denormalize_u8(np.asarray(frames[0, t_show]))
        rec = denormalize_u8(np.asarray(recon[0, t_rec]))
        heat = create_heatmap(np.asarray(err[0, t_mid]), size=orig.shape[1::-1])
        combined = np.hstack([orig, rec, heat])

        w = orig.shape[1]
        combined = cv2.cvtColor(combined, cv2.COLOR_RGB2BGR)
        middle_title = "Prediction" if objective == "predict" else "Reconstruction"
        heat_title = "Latent Distance" if window_maps_fn is not None else "Error Heatmap"
        cv2.putText(combined, "Original", (10, 25), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2)
        cv2.putText(combined, middle_title, (w + 10, 25), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2)
        cv2.putText(combined, heat_title, (2 * w + 10, 25), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2)
        cv2.putText(
            combined,
            f"{label_name} | Score: {float(seq[0]):.4f}",
            (10, combined.shape[0] - 6),
            cv2.FONT_HERSHEY_SIMPLEX,
            0.6,
            (0, 255, 0) if label == 0 else (0, 0, 255),
            2,
        )
        combined = cv2.cvtColor(combined, cv2.COLOR_BGR2RGB)

        plt.figure(figsize=(12, 4))
        plt.imshow(combined)
        plt.axis("off")
        plt.tight_layout()
        plt.savefig(
            output_dir / f"visualization_{idx}_{label_name.lower()}.png",
            dpi=150,
            bbox_inches="tight",
        )
        plt.close()
    print(f"Saved {len(selected)} visualizations")
