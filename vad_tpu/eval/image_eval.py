"""Image-model evaluation: AUROC, per-defect breakdown, artifacts.

Behavior parity with reference evaluate.py:207-282: rebuilds the model
from the checkpoint's stored args, scores the test split, prints AUROC and
the per-defect table, and writes roc_curve.png / score_distribution.png /
reconstructions.png / results.txt into `<ckpt_dir>/evaluation/` with the
reference's exact results.txt line format.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vad_tpu.data.image_dataset import MVTecDataset
from vad_tpu.data.loader import Loader
from vad_tpu.eval.metrics import auroc, average_precision, per_defect_breakdown
from vad_tpu.eval.plots import (
    plot_reconstruction_grid,
    plot_roc_curve,
    plot_score_distribution,
)
from vad_tpu.models.autoencoder import ConvAutoencoder
from vad_tpu.parallel.sharding import data_parallel_jit, pad_batch_for_devices
from vad_tpu.utils.checkpoint import load_checkpoint


def load_image_model(checkpoint_path: str | Path) -> Tuple[ConvAutoencoder, Dict, Dict]:
    """(model, variables, train_args) from a self-describing checkpoint."""
    from vad_tpu.core.config import ImageAEConfig

    ckpt = load_checkpoint(checkpoint_path)
    train_args = ckpt.get("args", {})
    cfg = ImageAEConfig.from_args(train_args)
    model = ConvAutoencoder(
        in_channels=cfg.in_channels, latent_dim=cfg.latent_dim, norm=cfg.norm,
        stem=cfg.stem,
    )
    variables = {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats") or {}}
    epoch = ckpt.get("epoch", "unknown")
    print(f"Loaded model from epoch {epoch}")
    if ckpt.get("train_loss") is not None:
        print(f"Training loss: {ckpt['train_loss']:.6f}")
    return model, variables, train_args


SCORE_MODES = ("mean", "max", "p99")


def smooth_error_map(err: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian-blur error maps [B, H, W] on device (depthwise conv).

    Standard anomaly-localization post-processing: averages out per-pixel
    reconstruction noise so max/percentile scores respond to defect-sized
    blobs rather than isolated hot pixels.
    """
    from vad_tpu.ops.losses import _gaussian_window

    size = max(3, int(2 * round(2 * sigma) + 1))
    win = jnp.asarray(_gaussian_window(size, sigma), err.dtype)
    return jax.lax.conv_general_dilated(
        err[..., None],
        win[:, :, None, None],
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[..., 0]


def compute_scores(
    model, variables, test_ds, batch_size: int = 16, num_workers: int = 4,
    score_mode: str = "mean", score_smooth: float = 0.0, mesh=None,
    maps_fn=None, scorer_state=None,
):
    """(labels, scores, defect_types) over the test split.

    score_mode reduces the per-pixel error map to the image score:
    'mean' is the reference's definition (autoencoder.py:211-221);
    'max' / 'p99' (beyond-reference) are far more sensitive to small
    low-contrast defects, which a global mean dilutes.  score_smooth > 0
    Gaussian-blurs the map (sigma in pixels) before the reduction.
    ``mesh``: shard each batch over the 'data' axis
    (parallel.sharding.data_parallel_jit).
    ``maps_fn(variables, scorer_state, x) -> [B, H, W]`` replaces the
    reconstruction error map as the anomaly map (the latent-distance
    scorer path); ``scorer_state`` is its fitted-statistics pytree,
    threaded through the jit as a runtime argument rather than closed
    over (latent_score.stats_state explains why).
    """
    if mesh is not None:
        from vad_tpu.parallel.sharding import padded_batch_size

        batch_size = padded_batch_size(batch_size, mesh)
    loader = Loader(test_ds, batch_size, num_workers=num_workers)

    def score_step(vs, x):
        v, state = vs
        if maps_fn is not None:
            err = maps_fn(v, state, x)
        else:
            err = model.apply(
                v, x, per_pixel=True, method=ConvAutoencoder.reconstruction_error
            )
        if score_smooth > 0:
            err = smooth_error_map(err, score_smooth)
        flat = err.reshape(err.shape[0], -1)
        if score_mode == "max":
            return jnp.max(flat, axis=1)
        if score_mode == "p99":
            return jnp.percentile(flat, 99.0, axis=1)
        return jnp.mean(flat, axis=1)

    score_step = data_parallel_jit(score_step, mesh)
    labels, scores, defects = [], [], []
    for batch in loader:
        padded, n_real = pad_batch_for_devices({"image": batch["image"]}, batch_size)
        s = np.asarray(score_step((variables, scorer_state), padded["image"]))[:n_real]
        scores.append(s)
        labels.append(np.asarray(batch["label"]))
        defects.extend(batch["defect_type"])
    return np.concatenate(labels), np.concatenate(scores), defects


def compute_localization(
    model, variables, test_ds, batch_size: int = 16, score_smooth: float = 0.0,
    mesh=None, maps_fn=None, scorer_state=None,
) -> Dict[str, float]:
    """Localization metrics against the ground-truth masks, one device pass.

    Beyond-reference capability (the reference loads GT masks but never
    scores localization).  Returns:
    - ``pixel_auroc``: per-pixel error maps vs binarized masks over the
      whole test split;
    - ``aupro``: area under the per-region-overlap curve to FPR 0.3
      (eval.metrics.aupro) — the standard MVTec metric where every
      connected defect region counts equally, so small defects are not
      drowned out by large ones the way they are in pixel AUROC.

    ``score_smooth`` applies the same Gaussian blur the image score used,
    so all numbers come from the same maps.  NaN for a metric its inputs
    cannot support (single-class masks / no defect components).
    """
    from vad_tpu.eval.metrics import aupro as _aupro

    if mesh is not None:
        from vad_tpu.parallel.sharding import padded_batch_size

        batch_size = padded_batch_size(batch_size, mesh)
    loader = Loader(test_ds, batch_size, num_workers=4)

    def maps_step(vs, x):
        v, state = vs
        if maps_fn is not None:
            err = maps_fn(v, state, x)
        else:
            err = model.apply(
                v, x, per_pixel=True, method=ConvAutoencoder.reconstruction_error
            )
        if score_smooth > 0:
            err = smooth_error_map(err, score_smooth)
        return err

    maps_step = data_parallel_jit(maps_step, mesh)
    all_maps, all_masks = [], []
    for batch in loader:
        padded, n_real = pad_batch_for_devices({"image": batch["image"]}, batch_size)
        err = np.asarray(maps_step((variables, scorer_state), padded["image"]))[:n_real]
        all_maps.append(err)
        all_masks.append(np.asarray(batch["mask"]) > 0.5)
    maps = np.concatenate(all_maps)
    masks = np.concatenate(all_masks)
    flat_labels = masks.astype(np.int64).reshape(-1)
    if flat_labels.min() == flat_labels.max():
        pixel = float("nan")
    else:
        pixel = auroc(flat_labels, maps.reshape(-1))
    return {"pixel_auroc": pixel, "aupro": _aupro(masks, maps)}


def make_reconstruction_rows(model, variables, test_ds, n_samples: int = 8,
                             maps_fn=None, scorer_state=None):
    """Half normal / half anomalous samples with recon + error map + mask
    (reference evaluate.py:113-131 selection policy).  With ``maps_fn``
    the error panel shows that anomaly map (e.g. latent distance) while
    the recon panel stays the decoder output."""
    labels = test_ds.labels
    normal_idx = [i for i, l in enumerate(labels) if l == 0][: n_samples // 2]
    anomaly_idx = [i for i, l in enumerate(labels) if l == 1][: n_samples // 2]
    selected = normal_idx + anomaly_idx
    if not selected:
        return []

    @jax.jit
    def recon_and_error(vs, x):
        v, state = vs
        recon = model.apply(v, x, train=False)
        if maps_fn is not None:
            err = maps_fn(v, state, x)
        else:
            err = model.apply(
                v, x, per_pixel=True, method=ConvAutoencoder.reconstruction_error
            )
        return recon, err

    rows = []
    for idx in selected:
        sample = test_ds[idx]
        x = jnp.asarray(sample["image"][None])
        recon, err = recon_and_error((variables, scorer_state), x)
        rows.append(
            {
                "image": sample["image"],
                "recon": np.asarray(recon[0]),
                "error": np.asarray(err[0]),
                "mask": sample["mask"],
                "defect_type": sample["defect_type"],
            }
        )
    return rows


def make_latent_maps_fn(
    model, variables, train_ds, *, batch_size: int = 16, layers=(0, 1, 2),
    proj_dim: int = 128, grid=None, seed: int = 0, save_path=None,
    load_path=None,
):
    """Fit (or load) the latent-distance scorer and return
    (maps_fn, stats): ``maps_fn(v, x) -> [B, H, W]`` Mahalanobis maps
    upsampled to image resolution (eval/latent_score.py).

    Fitting is one streaming encoder pass over ``train_ds``; ``save_path``
    (npz) persists the statistics next to the evaluation artifacts, and
    ``load_path`` reuses a previous fit instead (--latent-stats).

    Returns ``maps_fn(variables, scorer_state, x)`` plus the matching
    ``scorer_state`` pytree — state is a runtime argument, never a jit
    closure constant (latent_score.stats_state).
    """
    from vad_tpu.eval.latent_score import (
        fit_or_load,
        make_distance_fn,
        stats_state,
        upsample_maps,
    )

    def pyramid_fn(v, x):
        return model.apply(v, x, method=ConvAutoencoder.feature_pyramid)

    loader = Loader(train_ds, batch_size, num_workers=4)
    stats = fit_or_load(
        pyramid_fn,
        variables,
        (b["image"] for b in loader),
        layers=layers,
        proj_dim=proj_dim,
        grid=grid,
        seed=seed,
        save_path=save_path,
        load_path=load_path,
        what="images",
    )
    dfn = make_distance_fn(pyramid_fn, stats.layers, stats.grid)

    def maps_fn(v, state, x):
        return upsample_maps(dfn(v, state, x), x.shape[1])

    return maps_fn, stats_state(stats)


def write_results_txt(
    path: Path, score: float, breakdown: Dict[str, Dict],
    pixel_score: float = float("nan"), aupro_score: float = float("nan"),
    scorer: str = "recon", ap_score: float = float("nan"),
) -> None:
    """reference evaluate.py:273-278 format (leading lines byte-compatible;
    localization metrics and a non-default scorer appended as extra
    trailing lines when applicable)."""
    with open(path, "w") as f:
        f.write(f"AUROC: {score:.4f}\n\n")
        f.write("Per-defect breakdown:\n")
        for defect, res in sorted(breakdown.items()):
            status = "ANOMALY" if res["is_anomaly"] else "NORMAL"
            f.write(
                f"  {defect}: {status}, n={res['count']}, "
                f"mean_score={res['mean_score']:.4f}\n"
            )
        if np.isfinite(ap_score):
            f.write(f"\nAverage precision (AUPRC): {ap_score:.4f}\n")
        if np.isfinite(pixel_score):
            f.write(f"\nPixel-level AUROC: {pixel_score:.4f}\n")
        if np.isfinite(aupro_score):
            f.write(f"AUPRO (FPR<=0.3): {aupro_score:.4f}\n")
        if scorer != "recon":
            f.write(f"\nScorer: {scorer}\n")


def evaluate(args: Any) -> float:
    """Main evaluation flow; args mirrors the reference CLI namespace."""
    devs = jax.devices()
    print(f"Using device: {devs[0].platform}:{devs[0].device_kind}")

    checkpoint_path = Path(args.checkpoint)
    model, variables, train_args = load_image_model(checkpoint_path)

    category = args.category or train_args.get("category", "synthetic")
    data_dir = args.data_dir or train_args.get("data_dir", "./data")
    image_size = int(train_args.get("image_size", 256))

    print(f"\nEvaluating on category: {category}")
    test_ds = MVTecDataset(data_dir, category, "test", image_size)
    print(f"Test samples: {len(test_ds)}")

    output_dir = checkpoint_path.parent / "evaluation"
    output_dir.mkdir(exist_ok=True)

    mesh = None
    if getattr(args, "data_parallel", False):
        from vad_tpu.parallel.sharding import get_mesh

        mesh = get_mesh()
        print(f"Data-parallel evaluation over {mesh.shape['data']} devices")

    score_mode = getattr(args, "score_mode", "mean") or "mean"
    score_smooth = float(getattr(args, "score_smooth", 0.0) or 0.0)
    if score_mode != "mean" or score_smooth > 0:
        print(
            f"Score mode: {score_mode} of the per-pixel error map"
            + (f" (gaussian sigma={score_smooth})" if score_smooth > 0 else "")
        )

    maps_fn = None
    scorer_state = None
    scorer = getattr(args, "scorer", "recon") or "recon"
    if scorer == "latent":
        train_ds = MVTecDataset(data_dir, category, "train", image_size)
        load_path = getattr(args, "latent_stats", None)
        if not load_path:
            print(
                f"Latent-distance scorer: fitting per-position Gaussians on "
                f"{len(train_ds)} normal training images..."
            )
        else:
            print("Latent-distance scorer:")
        maps_fn, scorer_state = make_latent_maps_fn(
            model,
            variables,
            train_ds,
            proj_dim=int(getattr(args, "latent_proj_dim", 128) or 128),
            grid=getattr(args, "latent_grid", None),
            seed=int(getattr(args, "seed", 0) or 0),
            save_path=output_dir / "latent_stats.npz",
            load_path=load_path,
        )

    print("\nComputing metrics...")
    labels, scores, defects = compute_scores(
        model, variables, test_ds, score_mode=score_mode, score_smooth=score_smooth,
        mesh=mesh, maps_fn=maps_fn, scorer_state=scorer_state,
    )
    ap_score = float("nan")
    if len(np.unique(labels)) > 1:
        score = auroc(labels, scores)
        ap_score = average_precision(labels, scores)
    else:
        # single-class test split (e.g. only good/ images present)
        score = 0.0
        print("Cannot compute AUROC - only one class present")
    breakdown = per_defect_breakdown(labels, scores, defects)
    loc = compute_localization(
        model, variables, test_ds, score_smooth=score_smooth, mesh=mesh,
        maps_fn=maps_fn, scorer_state=scorer_state,
    )
    pixel_score = loc["pixel_auroc"]

    print(f"\n{'=' * 50}")
    print(f"AUROC: {score:.4f}")
    if np.isfinite(ap_score):
        print(f"Average precision (AUPRC): {ap_score:.4f}")
    if np.isfinite(pixel_score):
        print(f"Pixel-level AUROC: {pixel_score:.4f}")
    if np.isfinite(loc["aupro"]):
        print(f"AUPRO (FPR<=0.3): {loc['aupro']:.4f}")
    print(f"{'=' * 50}")
    print("\nPer-defect-type breakdown:")
    print("-" * 40)
    for defect, res in sorted(breakdown.items()):
        status = "ANOMALY" if res["is_anomaly"] else "NORMAL"
        print(
            f"  {defect:20s} | {status:7s} | n={res['count']:3d} | "
            f"mean_score={res['mean_score']:.4f}"
        )

    print("\nGenerating visualizations...")
    if len(np.unique(labels)) > 1:
        plot_roc_curve(labels, scores, output_dir / "roc_curve.png")
    plot_score_distribution(labels, scores, output_dir / "score_distribution.png")
    rows = make_reconstruction_rows(
        model, variables, test_ds, maps_fn=maps_fn, scorer_state=scorer_state
    )
    plot_reconstruction_grid(rows, output_dir / "reconstructions.png")
    write_results_txt(
        output_dir / "results.txt", score, breakdown, pixel_score, loc["aupro"],
        scorer=scorer, ap_score=ap_score,
    )

    print(f"\nResults saved to: {output_dir}")
    return score
