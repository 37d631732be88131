"""Video datasets: IPAD format, generic folders, single video files.

Window indexing is pure metadata (like reference video_dataset.py:114-131):
a dataset is a list of (source, start_frame, label) windows; frames decode
lazily at access time.  Semantics parity with the reference:

- IPAD layout `<cat>/training|testing/frames/<vid>/` with per-frame labels
  in `<cat>/test_label/<vid>.npy`; a window is anomalous iff ANY frame in
  it is anomalous (video_dataset.py:119-121).
- Generic layout `<cat>/<split>/<label_folder>/` holding video files
  (.mp4/.avi/.mov/.mkv) or frame folders; label 0 iff the folder is named
  good/normal/train (video_dataset.py:219).
- Single-file dataset over stride-S windows for inference
  (video_dataset.py:332-402).

TPU-first difference: the reference re-opens the video and seeks for every
window (video_dataset.py:379-394).  Here each dataset keeps per-thread
cv2.VideoCapture handles and detects sequential access, so dense stride-1
scoring reads each frame once instead of 16 times.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from vad_tpu.data.image_dataset import IMAGE_EXTS

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv")


def _normalize_frame(frame_rgb: np.ndarray, image_size: int) -> np.ndarray:
    """uint8 RGB frame -> resized float32 [-1, 1] HWC."""
    if frame_rgb.shape[0] != image_size or frame_rgb.shape[1] != image_size:
        frame_rgb = cv2.resize(
            frame_rgb, (image_size, image_size), interpolation=cv2.INTER_LINEAR
        )
    return frame_rgb.astype(np.float32) / 127.5 - 1.0


def _load_u8(path: str, image_size: int) -> np.ndarray:
    """Decode + resize an image file to uint8 RGB [H, W, 3]."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if img.size != (image_size, image_size):
        img = img.resize((image_size, image_size), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


@dataclass
class Window:
    """One sliding-window sample (metadata only; frames decode lazily)."""

    source: Union[str, Tuple[str, ...]]  # video path or frame-path tuple
    start: int
    label: int
    label_name: str
    video_id: str
    frame_labels: Optional[np.ndarray] = None  # per-frame 0/1, test only


class _CaptureCache:
    """Per-thread cv2.VideoCapture pool with sequential-read detection.

    Handles are bounded (``max_per_thread``, oldest-released-first) and the
    whole pool is releasable via :meth:`close` — long-lived processes (the
    UI, serving) would otherwise accumulate open file descriptors as
    datasets churn.  Datasets call close() on teardown; ``__del__`` is a
    GC backstop.
    """

    def __init__(self, max_per_thread: int = 8) -> None:
        self._local = threading.local()
        self.max_per_thread = max_per_thread
        # threading.local hides other threads' stores from close(); track
        # every store centrally so one call releases all handles
        self._stores: List[Dict] = []
        self._stores_lock = threading.Lock()

    def close(self) -> None:
        """Release every cached VideoCapture across all threads.

        Stores stay registered (threads keep their thread-local reference
        to the same dict), so a read after close() is still tracked."""
        with self._stores_lock:
            stores = list(self._stores)
        for store in stores:
            for cap, _ in list(store.values()):
                cap.release()
            store.clear()

    def __del__(self) -> None:  # pragma: no cover - GC timing dependent
        try:
            self.close()
        except Exception:
            pass

    def open_handles(self) -> int:
        with self._stores_lock:
            return sum(len(s) for s in self._stores)

    def read_window(self, path: str, start: int, length: int) -> List[np.ndarray]:
        if cv2 is None:  # pragma: no cover
            raise RuntimeError("cv2 is required to decode video files")
        store = getattr(self._local, "caps", None)
        if store is None:
            store = self._local.caps = {}
            with self._stores_lock:
                self._stores.append(store)
        cap, pos = store.get(path, (None, -1))
        if cap is None:
            while len(store) >= self.max_per_thread:
                old_cap, _ = store.pop(next(iter(store)))  # oldest insertion
                old_cap.release()
            cap = cv2.VideoCapture(path)
            pos = 0
        if pos != start:
            cap.set(cv2.CAP_PROP_POS_FRAMES, start)
            pos = start
        frames: List[np.ndarray] = []
        for _ in range(length):
            ok, frame = cap.read()
            if not ok:
                break
            pos += 1
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        store[path] = (cap, pos)
        if not frames and length > 0:
            # container header overstated the decodable frame count
            # (common with VBR / corrupt-tail files) and this window lies
            # entirely past the end — fail loudly rather than np.stack([])
            raise RuntimeError(
                f"could not decode any frame of window [{start}, {start + length}) "
                f"from {path}; the container's frame count appears to "
                f"overstate the decodable stream"
            )
        # Short reads (corrupt tail) are padded with the last frame so
        # batch shapes stay static for jit.
        while len(frames) < length:
            frames.append(frames[-1])
        return frames


class _WindowDataset:
    """Shared base: window list + lazy decode + dict samples.

    With ``cache_frames`` (default on, bounded by VAD_FRAME_CACHE_BYTES,
    4 GiB default), every source frame is decoded exactly once into a
    shared uint8 array at construction and windows become memory slices.
    Overlapping windows (stride < sequence_length) otherwise re-decode
    each frame sequence_length/stride times per epoch — on a single-core
    host that dominates the training step (the reference pays this same
    cost through its per-item PIL/cv2 decode, video_dataset.py:136-152).
    """

    def __init__(
        self,
        sequence_length: int,
        stride: int,
        image_size: int,
        cache_frames: bool = True,
        normalize: bool = True,
    ) -> None:
        self.sequence_length = sequence_length
        self.stride = stride
        self.image_size = image_size
        self.cache_frames = cache_frames
        # normalize=False returns raw uint8 frames: the trainers use this
        # and normalize on device (quarter-size host->device transfers)
        self.normalize = normalize
        self.windows: List[Window] = []
        self._caps = _CaptureCache()
        self._cache: Dict[Union[str, Tuple[str, ...]], np.ndarray] = {}

    def _cache_limit_bytes(self) -> int:
        import os

        return int(os.environ.get("VAD_FRAME_CACHE_BYTES", 4 * 1024**3))

    def _build_frame_cache(self) -> None:
        """Decode every distinct source once into uint8 [N, H, W, 3].

        Sources decode concurrently (cv2 and image codecs release the GIL),
        so startup on a many-video dataset scales with host cores instead of
        serializing one VideoCapture at a time; per-source frame totals are
        computed in one pass over the window list rather than an O(windows)
        ``max()`` scan per source.
        """
        if not self.cache_frames or not self.windows:
            return
        import os

        # one pass: frames needed per source = furthest window start + T
        per_source_frames: Dict[Union[str, Tuple[str, ...]], int] = {}
        for w in self.windows:
            if isinstance(w.source, str):
                need = w.start + self.sequence_length
                if need > per_source_frames.get(w.source, 0):
                    per_source_frames[w.source] = need
            else:
                per_source_frames.setdefault(w.source, len(w.source))
        total_frames = sum(per_source_frames.values())
        if total_frames * self.image_size * self.image_size * 3 > self._cache_limit_bytes():
            self.cache_frames = False
            return
        from concurrent.futures import ThreadPoolExecutor

        def decode_source(src):
            if isinstance(src, str):
                raw = self._caps.read_window(src, 0, per_source_frames[src])
                arr = np.stack(
                    [
                        f
                        if f.shape[:2] == (self.image_size, self.image_size)
                        else cv2.resize(f, (self.image_size, self.image_size),
                                        interpolation=cv2.INTER_LINEAR)
                        for f in raw
                    ]
                )
            else:
                with ThreadPoolExecutor(max_workers=4) as pool:
                    arr = np.stack(list(pool.map(lambda p: _load_u8(p, self.image_size), src)))
            return src, arr

        sources = list(per_source_frames)
        workers = min(len(sources), max(os.cpu_count() or 1, 1), 8)
        if workers <= 1:
            for src in sources:
                key, arr = decode_source(src)
                self._cache[key] = arr
        else:
            # _CaptureCache keeps per-thread capture stores, so concurrent
            # decode_source calls never share a cv2.VideoCapture handle
            with ThreadPoolExecutor(max_workers=workers) as pool:
                for key, arr in pool.map(decode_source, sources):
                    self._cache[key] = arr

    def __len__(self) -> int:
        return len(self.windows)

    def close(self) -> None:
        """Release decoder handles (and the decoded-frame cache).  Safe to
        call repeatedly; the dataset remains usable (handles reopen lazily)."""
        self._caps.close()
        self._cache.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc) -> bool:
        self.close()
        return False

    @property
    def labels(self) -> np.ndarray:
        return np.array([w.label for w in self.windows], dtype=np.int64)

    def _decode_u8(self, w: Window) -> np.ndarray:
        """uint8 [T, H, W, 3] window frames (cache hit = memory slice)."""
        cached = self._cache.get(w.source)
        if cached is not None:
            return cached[w.start : w.start + self.sequence_length]
        if isinstance(w.source, str):
            raw = self._caps.read_window(w.source, w.start, self.sequence_length)
            return np.stack(
                [
                    f
                    if f.shape[:2] == (self.image_size, self.image_size)
                    else cv2.resize(f, (self.image_size, self.image_size),
                                    interpolation=cv2.INTER_LINEAR)
                    for f in raw
                ]
            )
        paths = w.source[w.start : w.start + self.sequence_length]
        return np.stack([_load_u8(p, self.image_size) for p in paths])

    def _decode(self, w: Window) -> np.ndarray:
        u8 = self._decode_u8(w)
        if not self.normalize:
            return u8  # [T, H, W, 3] uint8; consumer normalizes on device
        return u8.astype(np.float32) / 127.5 - 1.0  # [T, H, W, 3] in [-1, 1]

    def __getitem__(self, idx: int) -> Dict:
        w = self.windows[idx]
        sample = {
            "frames": self._decode(w),
            "label": np.int64(w.label),
            "start_frame": np.int64(w.start),
            "video": w.video_id,
        }
        if w.frame_labels is not None:
            sample["frame_labels"] = w.frame_labels.astype(np.int64)
        else:
            # uniform keys across samples so batches stack cleanly
            sample["frame_labels"] = np.full(self.sequence_length, w.label, dtype=np.int64)
        return sample

    @property
    def has_frame_labels(self) -> bool:
        return any(w.frame_labels is not None for w in self.windows)

    def _add_windows(
        self,
        source: Union[str, Tuple[str, ...]],
        total: int,
        label: int,
        label_name: str,
        video_id: str,
        frame_labels: Optional[np.ndarray],
    ) -> None:
        if total < self.sequence_length:
            return
        for start in range(0, total - self.sequence_length + 1, self.stride):
            end = start + self.sequence_length
            fl = None
            win_label = label
            if frame_labels is not None:
                fl = np.asarray(frame_labels[start:end])
                # anomalous iff ANY frame in the window is anomalous
                win_label = int(np.any(fl == 1))
            self.windows.append(
                Window(source, start, win_label, label_name, video_id, fl)
            )


class IPADDataset(_WindowDataset):
    """IPAD-format dataset (reference video_dataset.py:25-152)."""

    def __init__(
        self,
        root_dir: str,
        category: str,
        split: str = "train",
        sequence_length: int = 16,
        stride: int = 4,
        image_size: int = 256,
        cache_frames: bool = True,
        normalize: bool = True,
    ) -> None:
        super().__init__(sequence_length, stride, image_size, cache_frames, normalize)
        root = Path(root_dir) / category
        if split == "train":
            frames_dir = root / "training" / "frames"
            labels_dir = None
        else:
            frames_dir = root / "testing" / "frames"
            labels_dir = root / "test_label"
        if not frames_dir.exists():
            raise FileNotFoundError(f"Dataset not found at {frames_dir}")

        for video_folder in sorted(frames_dir.iterdir()):
            if not video_folder.is_dir():
                continue
            vid = video_folder.name
            paths = tuple(
                str(f)
                for f in sorted(video_folder.iterdir())
                if f.suffix.lower() in IMAGE_EXTS
            )
            frame_labels = None
            if labels_dir is not None:
                # both zero-padded-numeric and literal naming conventions
                candidates = [labels_dir / f"{vid}.npy"]
                try:
                    candidates.insert(0, labels_dir / f"{int(vid):03d}.npy")
                except ValueError:
                    pass
                for c in candidates:
                    if c.exists():
                        frame_labels = np.load(c)
                        break
            self._add_windows(paths, len(paths), 0, "normal", vid, frame_labels)
        self._build_frame_cache()


class VideoDataset(_WindowDataset):
    """Generic `<cat>/<split>/<label_folder>/` dataset of video files or
    frame folders (reference video_dataset.py:155-329)."""

    NORMAL_FOLDERS = ("good", "normal", "train")

    def __init__(
        self,
        root_dir: str,
        category: str,
        split: str = "train",
        sequence_length: int = 16,
        stride: int = 4,
        image_size: int = 256,
        cache_frames: bool = True,
        normalize: bool = True,
    ) -> None:
        super().__init__(sequence_length, stride, image_size, cache_frames, normalize)
        split_dir = Path(root_dir) / category / split
        if not split_dir.exists():
            raise FileNotFoundError(f"Dataset not found at {split_dir}")

        for label_folder in sorted(split_dir.iterdir()):
            if not label_folder.is_dir():
                continue
            name = label_folder.name
            label = 0 if name in self.NORMAL_FOLDERS else 1
            for entry in sorted(label_folder.iterdir()):
                if entry.suffix.lower() in VIDEO_EXTS:
                    total = self._probe_video(str(entry))
                    self._add_windows(str(entry), total, label, name, entry.stem, None)
                elif entry.is_dir():
                    paths = tuple(
                        str(f)
                        for f in sorted(entry.iterdir())
                        if f.suffix.lower() in IMAGE_EXTS
                    )
                    self._add_windows(paths, len(paths), label, name, entry.name, None)
        self._build_frame_cache()

    @staticmethod
    def _probe_video(path: str) -> int:
        if cv2 is None:  # pragma: no cover
            raise RuntimeError("cv2 is required to index video files")
        cap = cv2.VideoCapture(path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        return total


class VideoFileDataset(_WindowDataset):
    """Stride-S windows over one video file, for inference on uploads
    (reference video_dataset.py:332-402).

    Samples additionally carry the raw uint8 frames (resized to
    image_size) for visualization overlays.
    """

    def __init__(
        self,
        video_path: str,
        sequence_length: int = 16,
        stride: int = 1,
        image_size: int = 256,
        return_original: bool = True,
    ) -> None:
        super().__init__(sequence_length, stride, image_size, cache_frames=False)
        self.video_path = str(video_path)
        self.return_original = return_original
        if cv2 is None:  # pragma: no cover
            raise RuntimeError("cv2 is required to read video files")
        cap = cv2.VideoCapture(self.video_path)
        self.total_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        cap.release()
        self._add_windows(
            self.video_path, self.total_frames, 0, "normal", Path(video_path).stem, None
        )

    def __getitem__(self, idx: int) -> Dict:
        w = self.windows[idx]
        raw = self._caps.read_window(w.source, w.start, self.sequence_length)
        sample = {
            "frames": np.stack([_normalize_frame(f, self.image_size) for f in raw]),
            "start_frame": np.int64(w.start),
        }
        if self.return_original:
            size = (self.image_size, self.image_size)
            sample["original_frames"] = np.stack(
                [
                    f
                    if f.shape[:2] == size
                    else cv2.resize(f, size, interpolation=cv2.INTER_LINEAR)
                    for f in raw
                ]
            )
        return sample


def detect_video_dataset_class(root_dir: str, category: str):
    """IPAD iff `<cat>/training/frames` exists, else generic layout
    (reference train_video.py:30-41)."""
    if (Path(root_dir) / category / "training" / "frames").exists():
        return IPADDataset
    return VideoDataset


def get_video_dataloaders(
    root_dir: str,
    category: str,
    sequence_length: int = 16,
    stride: int = 4,
    batch_size: int = 8,
    image_size: int = 256,
    num_workers: int = 4,
):
    """Train/test loader pair (reference video_dataset.py:405-456)."""
    from vad_tpu.data.loader import Loader

    cls = detect_video_dataset_class(root_dir, category)
    train = cls(root_dir, category, "train", sequence_length, stride, image_size)
    test = cls(root_dir, category, "test", sequence_length, stride, image_size)
    return (
        Loader(train, batch_size, shuffle=True, num_workers=num_workers, seed=0),
        Loader(test, batch_size, shuffle=False, num_workers=num_workers),
    )
