"""Synthetic dataset generators (images and video).

Deterministic, CPU-only fixtures that let the full train->evaluate
pipeline run without downloads — the same role as reference
utils/download_data.py:85-184 (gradient background + circle = normal;
scratch-line or dark spot + matching ground-truth mask = defect), but
drawn with vectorized numpy/cv2 instead of PIL ImageDraw.

The video generator is new capability (the reference ships no synthetic
video fixture): a circle orbits smoothly = normal; in anomalous clips a
dark intruder blob appears for a contiguous frame range, and per-frame
labels are written IPAD-style (test_label/<video>.npy) so frame-level
AUROC is exercised end to end.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

try:  # optional; only needed to render mp4 variants
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None
from PIL import Image


def _gradient_bg(size: int) -> np.ndarray:
    """Vertical gradient background, RGB uint8 [size, size, 3]."""
    rows = np.arange(size, dtype=np.int32)
    base = np.stack([50 + rows // 4, 50 + rows // 4, 60 + rows // 4], axis=-1)
    return np.broadcast_to(base[:, None, :], (size, size, 3)).astype(np.uint8)


def _disk_mask(size: int, cx: float, cy: float, radius: float) -> np.ndarray:
    yy, xx = np.mgrid[0:size, 0:size]
    return (xx - cx) ** 2 + (yy - cy) ** 2 <= radius**2


def _ring_mask(size: int, cx: float, cy: float, radius: float, width: float) -> np.ndarray:
    yy, xx = np.mgrid[0:size, 0:size]
    d2 = (xx - cx) ** 2 + (yy - cy) ** 2
    return (d2 <= (radius + width / 2) ** 2) & (d2 >= (radius - width / 2) ** 2)


def _normal_image(seed: int, size: int) -> np.ndarray:
    """Clean circle on a gradient background (deterministic per seed)."""
    rng = np.random.default_rng(seed)
    img = _gradient_bg(size).copy()
    center = size // 2
    radius = (60 + int(rng.integers(-10, 10))) * size // 256
    img[_disk_mask(size, center, center, radius)] = (200, 200, 210)
    img[_ring_mask(size, center, center, radius, max(3 * size // 256, 2))] = (150, 150, 160)
    return img


def _line_mask(size: int, p1, p2, width: int) -> np.ndarray:
    """Rasterize a thick line segment as a boolean mask (pure numpy)."""
    n = max(abs(p2[0] - p1[0]), abs(p2[1] - p1[1]), 1) * 4
    ts = np.linspace(0.0, 1.0, n)
    xs = np.clip(np.round(p1[0] + ts * (p2[0] - p1[0])).astype(int), 0, size - 1)
    ys = np.clip(np.round(p1[1] + ts * (p2[1] - p1[1])).astype(int), 0, size - 1)
    mask = np.zeros((size, size), dtype=bool)
    r = width // 2
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            mask[np.clip(ys + dy, 0, size - 1), np.clip(xs + dx, 0, size - 1)] = True
    return mask


def _defect_image(seed: int, size: int) -> tuple[np.ndarray, np.ndarray]:
    """Normal image plus a scratch or dark spot; returns (image, gt_mask)."""
    img = _normal_image(seed, size).copy()
    rng = np.random.default_rng(seed + 1000)
    s = size / 256.0
    if rng.random() > 0.5:  # scratch
        x1 = int(rng.integers(int(80 * s), int(180 * s)))
        y1 = int(rng.integers(int(80 * s), int(180 * s)))
        x2 = x1 + int(rng.integers(int(-40 * s), int(40 * s)))
        y2 = y1 + int(rng.integers(int(-40 * s), int(40 * s)))
        draw = _line_mask(size, (x1, y1), (x2, y2), max(int(3 * s), 2))
        gt = _line_mask(size, (x1, y1), (x2, y2), max(int(5 * s), 3))
        img[draw] = (50, 50, 50)
    else:  # spot
        cx = int(rng.integers(int(100 * s), int(156 * s)))
        cy = int(rng.integers(int(100 * s), int(156 * s)))
        r = int(rng.integers(max(int(5 * s), 2), max(int(15 * s), 4)))
        gt = _disk_mask(size, cx, cy, r)
        img[gt] = (30, 30, 30)
    return img, (gt.astype(np.uint8) * 255)


def create_synthetic_image_data(
    data_dir: str = "./data",
    category: str = "synthetic",
    n_train: int = 50,
    n_test_good: int = 10,
    n_test_defect: int = 20,
    image_size: int = 256,
) -> Path:
    """Write an MVTec-format synthetic dataset.

    Layout (consumed by MVTecDataset, matching reference dataset.py:90-124):
        <data_dir>/<category>/train/good/NNN.png
        <data_dir>/<category>/test/{good,defect}/NNN.png
        <data_dir>/<category>/ground_truth/defect/NNN_mask.png
    Seeds match the reference generator's offsets (train i, test-good
    i+100, test-defect i+200; download_data.py:160-177).
    """
    base = Path(data_dir) / category
    paths = {
        "train": base / "train" / "good",
        "good": base / "test" / "good",
        "defect": base / "test" / "defect",
        "gt": base / "ground_truth" / "defect",
    }
    for p in paths.values():
        p.mkdir(parents=True, exist_ok=True)

    for i in range(n_train):
        Image.fromarray(_normal_image(i, image_size)).save(paths["train"] / f"{i:03d}.png")
    for i in range(n_test_good):
        Image.fromarray(_normal_image(i + 100, image_size)).save(paths["good"] / f"{i:03d}.png")
    for i in range(n_test_defect):
        img, mask = _defect_image(i + 200, image_size)
        Image.fromarray(img).save(paths["defect"] / f"{i:03d}.png")
        Image.fromarray(mask).save(paths["gt"] / f"{i:03d}_mask.png")
    return base


def _value_noise(rng: np.random.Generator, size: int, octaves=(4, 8, 16, 32)) -> np.ndarray:
    """Multi-octave value noise in [0, 1] (pure numpy + cv2 upsampling)."""
    img = np.zeros((size, size), np.float32)
    amp_total = 0.0
    for i, o in enumerate(octaves):
        amp = 1.0 / (i + 1)
        grid = rng.random((o, o)).astype(np.float32)
        img += amp * cv2.resize(grid, (size, size), interpolation=cv2.INTER_CUBIC)
        amp_total += amp
    img /= amp_total
    return np.clip(img, 0.0, 1.0)


def _periodic_value_noise(rng: np.random.Generator, size: int, octaves=(4, 8, 16, 32)) -> np.ndarray:
    """size-periodic multi-octave value noise: each octave's coarse grid is
    tiled 2x2 before upsampling, then the central period is cropped, so
    the interpolation kernel sees wrapped neighbors at the seam."""
    img = np.zeros((size, size), np.float32)
    amp_total = 0.0
    for i, o in enumerate(octaves):
        amp = 1.0 / (i + 1)
        grid = np.tile(rng.random((o, o)).astype(np.float32), (2, 2))
        big = cv2.resize(grid, (2 * size, 2 * size), interpolation=cv2.INTER_CUBIC)
        img += amp * big[size // 2 : size // 2 + size, size // 2 : size // 2 + size]
        amp_total += amp
    return np.clip(img / amp_total, 0.0, 1.0)


def _textured_surface(seed: int, size: int, periodic: bool = False) -> np.ndarray:
    """Brushed-surface texture: directional stripes + value noise, uint8 RGB.

    The stripe pattern is category-constant; per-image noise varies with
    the seed, like photographs of the same industrial material.  With
    ``periodic`` the texture tiles seamlessly with period ``size`` (both
    stripe frequencies snapped to integer cycles and wrap-padded noise) —
    used by the scrolling-video fixture.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    if periodic:
        two_pi = 2.0 * np.pi
        kx = max(1, round(0.35 * size / two_pi))  # integer cycles per period
        ky = max(1, round(0.01 * size / two_pi))
        stripes = 0.5 + 0.08 * np.sin(
            xx * (kx * two_pi / size) + 3.0 * np.sin(yy * (ky * two_pi / size))
        )
        noise = _periodic_value_noise(rng, size)
    else:
        stripes = 0.5 + 0.08 * np.sin(xx * 0.35 + 3.0 * np.sin(yy * 0.01))
        noise = _value_noise(rng, size)
    lum = np.clip(0.65 * stripes + 0.35 * noise, 0, 1)
    base = (lum * 155 + 60).astype(np.uint8)
    return np.stack([base, base, (base * 0.96).astype(np.uint8)], axis=-1)


def _textured_defect(seed: int, size: int) -> tuple[np.ndarray, np.ndarray]:
    """Subtle low-contrast defect on the textured surface + GT mask."""
    img = _textured_surface(seed, size).astype(np.int16)
    rng = np.random.default_rng(seed + 5000)
    kind = rng.integers(0, 3)
    mask = np.zeros((size, size), bool)
    if kind == 0:  # smudge: local blur destroys the stripe texture
        cx, cy = rng.integers(size // 4, 3 * size // 4, size=2)
        r = int(rng.integers(size // 16, size // 8))
        mask = _disk_mask(size, cx, cy, r)
        blurred = cv2.GaussianBlur(img.astype(np.uint8), (0, 0), sigmaX=size / 40)
        img[mask] = blurred[mask]
    elif kind == 1:  # shallow scratch across the grain
        x1, y1 = rng.integers(size // 5, 4 * size // 5, size=2)
        x2 = int(np.clip(x1 + rng.integers(-size // 3, size // 3), 0, size - 1))
        y2 = int(np.clip(y1 + rng.integers(-size // 3, size // 3), 0, size - 1))
        mask = _line_mask(size, (x1, y1), (x2, y2), max(size // 86, 2))
        img[mask] -= int(rng.integers(18, 30))
    else:  # faint stain: small local brightness shift
        cx, cy = rng.integers(size // 4, 3 * size // 4, size=2)
        r = int(rng.integers(size // 12, size // 7))
        mask = _disk_mask(size, cx, cy, r)
        img[mask] += int(rng.integers(14, 24)) * (1 if rng.random() > 0.5 else -1)
    return np.clip(img, 0, 255).astype(np.uint8), mask.astype(np.uint8) * 255


def create_synthetic_textured_data(
    data_dir: str = "./data",
    category: str = "textured",
    n_train: int = 60,
    n_test_good: int = 15,
    n_test_defect: int = 25,
    image_size: int = 256,
) -> Path:
    """Harder MVTec-like fixture: structured texture, low-contrast defects.

    Same layout as create_synthetic_image_data; the circle fixture is
    nearly separable, this one requires the model to learn the texture
    statistics (smudges/scratches/stains shift pixels by <12%%).
    """
    base = Path(data_dir) / category
    paths = {
        "train": base / "train" / "good",
        "good": base / "test" / "good",
        "defect": base / "test" / "defect",
        "gt": base / "ground_truth" / "defect",
    }
    for p in paths.values():
        p.mkdir(parents=True, exist_ok=True)
    for i in range(n_train):
        Image.fromarray(_textured_surface(i, image_size)).save(paths["train"] / f"{i:03d}.png")
    for i in range(n_test_good):
        Image.fromarray(_textured_surface(i + 300, image_size)).save(paths["good"] / f"{i:03d}.png")
    for i in range(n_test_defect):
        img, mask = _textured_defect(i + 600, image_size)
        Image.fromarray(img).save(paths["defect"] / f"{i:03d}.png")
        Image.fromarray(mask).save(paths["gt"] / f"{i:03d}_mask.png")
    return base


def _video_frame(
    t: int, size: int, phase: float, speed: float, anomaly: bool, rng: np.random.Generator
) -> np.ndarray:
    """One frame: circle orbiting the center; optional intruder blob."""
    img = _gradient_bg(size).copy()
    center = size / 2
    orbit_r = size * 0.27
    ang = phase + speed * t
    cx = center + orbit_r * np.cos(ang)
    cy = center + orbit_r * np.sin(ang)
    r = size * 0.11
    img[_disk_mask(size, cx, cy, r)] = (200, 200, 210)
    img[_ring_mask(size, cx, cy, r, max(size // 96, 2))] = (150, 150, 160)
    if anomaly:
        # dark intruder moving against the orbit
        ix = size - cx
        iy = size - cy
        ir = size * 0.09 + rng.normal() * size * 0.01
        img[_disk_mask(size, ix, iy, max(ir, 2))] = (25, 25, 30)
    return img


def create_synthetic_video_data(
    data_dir: str = "./data",
    category: str = "synthetic_video",
    n_train_videos: int = 4,
    n_test_videos: int = 4,
    frames_per_video: int = 48,
    image_size: int = 256,
) -> Path:
    """Write an IPAD-format synthetic video dataset.

    Layout (consumed by IPADDataset, matching reference
    video_dataset.py:76-111):
        <data_dir>/<category>/training/frames/<vid>/NNNN.png
        <data_dir>/<category>/testing/frames/<vid>/NNNN.png
        <data_dir>/<category>/test_label/<vid>.npy    per-frame 0/1 labels

    Training clips are all-normal orbits.  Each test clip contains one
    anomalous frame range (the intruder blob) covering the middle ~40% of
    the clip.
    """
    base = Path(data_dir) / category
    train_frames = base / "training" / "frames"
    test_frames = base / "testing" / "frames"
    label_dir = base / "test_label"
    for p in (train_frames, test_frames, label_dir):
        p.mkdir(parents=True, exist_ok=True)

    for v in range(n_train_videos):
        rng = np.random.default_rng(10_000 + v)
        vdir = train_frames / f"{v:02d}"
        vdir.mkdir(exist_ok=True)
        phase = rng.uniform(0, 2 * np.pi)
        speed = rng.uniform(0.12, 0.2)
        for t in range(frames_per_video):
            frame = _video_frame(t, image_size, phase, speed, False, rng)
            Image.fromarray(frame).save(vdir / f"{t:04d}.png")

    for v in range(n_test_videos):
        rng = np.random.default_rng(20_000 + v)
        vdir = test_frames / f"{v:02d}"
        vdir.mkdir(exist_ok=True)
        phase = rng.uniform(0, 2 * np.pi)
        speed = rng.uniform(0.12, 0.2)
        labels = np.zeros(frames_per_video, dtype=np.int64)
        # even-indexed test videos carry an anomalous frame range; the
        # odd-indexed ones stay fully normal, so sliding windows of any
        # length/stride see both classes (window label = any-frame OR)
        if v % 2 == 0:
            a_start = int(frames_per_video * 0.4)
            a_end = int(frames_per_video * 0.7)
            labels[a_start:a_end] = 1
        for t in range(frames_per_video):
            frame = _video_frame(
                t, image_size, phase, speed, bool(labels[t]), rng
            )
            Image.fromarray(frame).save(vdir / f"{t:04d}.png")
        np.save(label_dir / f"{v:02d}.npy", labels)
    return base


def create_synthetic_textured_video_data(
    data_dir: str = "./data",
    category: str = "textured_video",
    n_train_videos: int = 4,
    n_test_videos: int = 4,
    frames_per_video: int = 96,
    image_size: int = 256,
) -> Path:
    """IPAD-format video fixture with a PURELY TEMPORAL anomaly.

    Every frame shows a scrolling textured surface (constant per-video
    velocity).  In anomalous ranges a circular patch of the texture
    scrolls AGAINST the global motion — each individual frame remains a
    perfectly plausible texture (it is texture), so per-frame appearance
    models score chance; only temporal modeling can detect the discordant
    motion.  (A frozen patch would be the opposite trap: MORE predictable
    than normal motion, inverting reconstruction-style scores.)
    """
    base = Path(data_dir) / category
    train_frames = base / "training" / "frames"
    test_frames = base / "testing" / "frames"
    label_dir = base / "test_label"
    for p in (train_frames, test_frames, label_dir):
        p.mkdir(parents=True, exist_ok=True)

    # ONE category-wide texture (a fixed camera watching the same
    # material): per-video texture variation would otherwise dominate the
    # anomaly signal, since reconstructability differs between textures.
    # Tiled 2x2 from an image_size-PERIODIC texture so the scrolling
    # window is seamless both spatially and temporally.
    canvas = np.tile(_textured_surface(424242, image_size, periodic=True), (2, 2, 1))

    def write_video(vdir: Path, seed: int, labels: Optional[np.ndarray]) -> None:
        vdir.mkdir(exist_ok=True)
        rng = np.random.default_rng(seed)
        tex = canvas
        vx, vy = rng.integers(1, 4, size=2) * (1 if rng.random() > 0.5 else -1)
        patch_mask = None
        if labels is not None and labels.any():
            cx, cy = rng.integers(image_size // 4, 3 * image_size // 4, size=2)
            r = int(rng.integers(image_size // 8, image_size // 5))
            patch_mask = _disk_mask(image_size, cx, cy, r)
        for t in range(frames_per_video):
            ox = (vx * t) % image_size
            oy = (vy * t) % image_size
            frame = tex[oy : oy + image_size, ox : ox + image_size].copy()
            if labels is not None and labels[t]:
                # discordant motion: the patch shows the texture scrolled
                # with the OPPOSITE velocity (2x relative speed mismatch)
                ox2 = (-vx * t) % image_size
                oy2 = (-vy * t) % image_size
                counter = tex[oy2 : oy2 + image_size, ox2 : ox2 + image_size]
                frame[patch_mask] = counter[patch_mask]
            Image.fromarray(frame).save(vdir / f"{t:04d}.png")

    for v in range(n_train_videos):
        write_video(train_frames / f"{v:02d}", 40_000 + v, None)
    for v in range(n_test_videos):
        labels = np.zeros(frames_per_video, dtype=np.int64)
        if v % 2 == 0:  # even-indexed anomalous; odd-indexed stay fully normal
            labels[int(frames_per_video * 0.4) : int(frames_per_video * 0.75)] = 1
        write_video(test_frames / f"{v:02d}", 50_000 + v, labels)
        np.save(label_dir / f"{v:02d}.npy", labels)
    return base


def create_synthetic_video_file(
    path: str,
    n_frames: int = 120,
    image_size: int = 256,
    fps: float = 30.0,
    anomaly_range: tuple[int, int] | None = None,
    seed: int = 0,
) -> str:
    """Render a single synthetic .mp4 (for evaluate_video --video tests)."""
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("cv2 is required to write synthetic video files")
    rng = np.random.default_rng(seed)
    phase = rng.uniform(0, 2 * np.pi)
    speed = 0.15
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (image_size, image_size)
    )
    try:
        for t in range(n_frames):
            anom = anomaly_range is not None and anomaly_range[0] <= t < anomaly_range[1]
            frame = _video_frame(t, image_size, phase, speed, anom, rng)
            writer.write(frame[:, :, ::-1])  # RGB -> BGR
    finally:
        writer.release()
    return str(path)


def install_mvtec_categories(src_dir: str, data_dir: str) -> Path:
    """Copy MVTec category folders from an extracted download into the
    data dir (reference download_data.py:16-53; copies whatever category
    folders exist rather than a hard-coded list)."""
    import shutil

    src, dst = Path(src_dir), Path(data_dir)
    dst.mkdir(parents=True, exist_ok=True)
    for cat in sorted(p.name for p in src.iterdir() if p.is_dir()):
        if not (dst / cat).exists():
            print(f"Copying {cat}...")
            shutil.copytree(src / cat, dst / cat)
    print(f"Dataset ready at: {dst.absolute()}")
    return dst


def download_with_kagglehub(data_dir: str = "./data") -> Optional[str]:
    """Programmatic MVTec-AD download via kagglehub (reference
    download_data.py:56-82), degrading gracefully to manual instructions
    when kagglehub is missing, credentials are absent, or there is no
    network (this sandbox has zero egress).

    Returns the kagglehub cache path on success, None otherwise.
    """
    fallback = (
        "Falling back to manual install: download "
        "https://www.kaggle.com/datasets/ipythonx/mvtec-ad , extract it, "
        "and run with --method manual --kaggle-path /path/to/extracted/mvtec."
    )
    try:
        import kagglehub
    except ImportError:
        print("kagglehub is not installed (pip install kagglehub).")
        print(fallback)
        return None
    print("Downloading MVTec AD from Kaggle (ipythonx/mvtec-ad)...")
    print("Note: requires Kaggle API credentials (~/.kaggle/kaggle.json)")
    try:
        path = kagglehub.dataset_download("ipythonx/mvtec-ad")
    except Exception as e:  # noqa: BLE001 - network/credential failures
        print(f"Download failed: {e}")
        print(fallback)
        return None
    print(f"Downloaded to: {path}")
    install_mvtec_categories(path, data_dir)
    return path


def main(argv=None) -> None:
    """CLI mirroring reference utils/download_data.py:187-218."""
    import argparse

    parser = argparse.ArgumentParser(description="Set up anomaly-detection datasets")
    parser.add_argument(
        "--method",
        type=str,
        default="synthetic",
        choices=["synthetic", "synthetic-textured", "synthetic-video",
                 "synthetic-textured-video", "kagglehub", "manual"],
    )
    parser.add_argument("--kaggle-path", type=str, default=None)
    parser.add_argument("--data-dir", type=str, default="./data")
    parser.add_argument("--category", type=str, default="synthetic")
    args = parser.parse_args(argv)

    if args.method == "synthetic":
        path = create_synthetic_image_data(args.data_dir, args.category)
        print(f"Synthetic image dataset created at: {path.absolute()}")
    elif args.method == "synthetic-textured":
        category = "textured" if args.category == "synthetic" else args.category
        path = create_synthetic_textured_data(args.data_dir, category)
        print(f"Synthetic textured dataset created at: {path.absolute()}")
    elif args.method == "synthetic-video":
        path = create_synthetic_video_data(args.data_dir, args.category)
        print(f"Synthetic video dataset created at: {path.absolute()}")
    elif args.method == "synthetic-textured-video":
        category = "textured_video" if args.category == "synthetic" else args.category
        path = create_synthetic_textured_video_data(args.data_dir, category)
        print(f"Synthetic textured video dataset created at: {path.absolute()}")
    elif args.method == "kagglehub":
        download_with_kagglehub(args.data_dir)
    else:  # manual
        if not args.kaggle_path:
            print("Pass --kaggle-path /path/to/extracted/mvtec to install it.")
            return
        install_mvtec_categories(args.kaggle_path, args.data_dir)


if __name__ == "__main__":
    main()
