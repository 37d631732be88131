"""Batch scoring of many video files through MultiStreamScorer slots.

The offline counterpart of the serving daemon: a directory (or list) of
clips is scored CONCURRENTLY — each video occupies one stream slot of a
single `MultiStreamScorer`, so the device always steps on the full
[num_slots, chunk, H, W, 3] batch and per-chip throughput matches the
multi-stream serving configuration instead of degrading to one
video-at-a-time.  Each video gets its own background decode thread
(vad_tpu.eval.video_render.iter_video_chunks), its ConvLSTM (h, c) is
carried across its chunks inside its slot, and when it ends the slot is
recycled for the next pending video.

The reference scores one video per process invocation, re-decoding and
re-scoring every frame sequence_length times (evaluate_video.py:309-404,
stride-1 windows); there is no batch mode at all.  Here a folder of N
clips costs ~max(decode, N_frames / device_fps), not N * per-video time.

CLI: ``evaluate_video.py --video-dir DIR``.
"""

from __future__ import annotations

import json
from collections import deque
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

VIDEO_EXTENSIONS = (".mp4", ".avi", ".mov", ".mkv")


class _VideoFeed:
    """One video's decode iterator + accumulated per-frame scores."""

    def __init__(self, path: str, chunk: int, image_size: int) -> None:
        from vad_tpu.eval.video_render import iter_video_chunks

        self.path = path
        self.scores: List[float] = []
        self.error: Optional[str] = None
        self._gen = iter_video_chunks(path, chunk, image_size)

    def next_chunk(self):
        """(raw u8 [chunk,H,W,3], n_valid) or None when exhausted/failed."""
        try:
            return next(self._gen)
        except StopIteration:
            return None
        except Exception as exc:  # decode failure: finish THIS video only
            self.error = str(exc)
            return None


def score_videos(
    model,
    variables,
    video_paths: Sequence[str],
    image_size: int = 256,
    chunk: int = 16,
    num_slots: Optional[int] = None,
    dtype=None,
    on_progress=None,
) -> Dict[str, dict]:
    """Score every frame of every video once, videos batched over slots.

    Returns {path: {"scores": np.ndarray [n_frames] | None,
                    "error": str | None}} — a video that fails to decode
    reports its error without aborting the batch.

    ``num_slots`` defaults to min(len(video_paths), 16) (the measured
    v5e saturation point).  Scores are numerically identical to scoring
    each video alone: slots never interact, and only submitting slots
    advance their carried state.
    """
    import jax.numpy as jnp

    from vad_tpu.eval.serving import MultiStreamScorer

    if not video_paths:
        return {}
    dtype = dtype or jnp.float32
    slots_n = num_slots or min(len(video_paths), 16)
    scorer = MultiStreamScorer(
        model, variables, num_slots=slots_n, chunk=chunk, image_size=image_size,
        dtype=dtype,
    )
    hw = scorer.image_hw

    pending = deque(str(p) for p in video_paths)
    feeds: Dict[int, _VideoFeed] = {}
    results: Dict[str, dict] = {}

    def finish(slot: int) -> None:
        feed = feeds.pop(slot)
        scorer.detach(slot)
        results[feed.path] = {
            "scores": None if feed.error else np.asarray(feed.scores, np.float64),
            "error": feed.error,
        }
        if on_progress is not None:
            on_progress(feed.path, results[feed.path])

    while pending or feeds:
        while pending and len(feeds) < slots_n:
            path = pending.popleft()
            slot = scorer.attach()
            feeds[slot] = _VideoFeed(path, chunk, image_size)

        batch = np.zeros((slots_n, chunk) + hw + (3,), np.uint8)
        submitted = np.zeros(slots_n, bool)
        n_valids: Dict[int, int] = {}
        for slot, feed in list(feeds.items()):
            item = feed.next_chunk()
            if item is None:
                finish(slot)
                continue
            raw, n_valid = item
            batch[slot] = raw
            submitted[slot] = True
            n_valids[slot] = n_valid

        if not submitted.any():
            continue
        scores = scorer.score_chunk(batch, submitted=submitted)
        for slot, n_valid in n_valids.items():
            feeds[slot].scores.extend(float(s) for s in scores[slot, :n_valid])
    return results


def score_video_dir(
    checkpoint: str,
    video_dir: str,
    output_dir: Optional[str] = None,
    num_slots: Optional[int] = None,
    save_timelines: bool = True,
) -> dict:
    """Score every video file under ``video_dir`` (recursively) with the
    model in ``checkpoint``; write ``batch_scores.json`` plus per-video
    score-timeline PNGs under ``output_dir`` (default:
    ``<checkpoint_dir>/batch_scoring/``).

    Per-frame scores are flagged against the checkpoint's calibrated
    ``frame_score_threshold`` when one is valid for reconstruction
    scoring (see vad_tpu.eval.metrics.serving_frame_threshold); without
    one, raw scores are still reported.

    Returns the summary dict (the same content as batch_scores.json).
    """
    from vad_tpu.eval.metrics import serving_frame_threshold
    from vad_tpu.eval.video_eval import load_video_model
    from vad_tpu.utils.checkpoint import load_checkpoint

    root = Path(video_dir)
    paths = sorted(
        str(p) for p in root.rglob("*")
        if p.is_file() and p.suffix.lower() in VIDEO_EXTENSIONS
    )
    if not paths:
        raise FileNotFoundError(
            f"no video files ({'/'.join(VIDEO_EXTENSIONS)}) under {video_dir}"
        )
    model, variables, saved = load_video_model(checkpoint)
    threshold = serving_frame_threshold(load_checkpoint(checkpoint))
    image_size = int(saved.get("image_size", 256))
    chunk = int(saved.get("sequence_length", 16))

    out_dir = Path(output_dir) if output_dir else Path(checkpoint).parent / "batch_scoring"
    out_dir.mkdir(parents=True, exist_ok=True)

    print(f"Scoring {len(paths)} videos from {video_dir} "
          f"({min(num_slots or 16, len(paths))} concurrent slots)...")

    def on_progress(path: str, result: dict) -> None:
        if result["error"]:
            print(f"  FAILED {path}: {result['error']}")
        else:
            s = result["scores"]
            print(f"  scored {path}: {len(s)} frames, "
                  f"mean {s.mean():.6f}, max {s.max():.6f}"
                  if len(s) else f"  scored {path}: 0 frames")

    results = score_videos(
        model, variables, paths, image_size=image_size, chunk=chunk,
        num_slots=num_slots, on_progress=on_progress,
    )

    summary = {"checkpoint": str(checkpoint), "video_dir": str(video_dir),
               "frame_score_threshold": threshold, "videos": {}}
    for path in paths:
        res = results[path]
        if res["error"] is not None:
            summary["videos"][path] = {"error": res["error"]}
            continue
        s = res["scores"]
        entry = {
            "frames": int(len(s)),
            "mean_score": float(s.mean()) if len(s) else None,
            "max_score": float(s.max()) if len(s) else None,
        }
        if threshold is not None and len(s):
            flagged = s > threshold
            entry["anomalous_frames"] = int(flagged.sum())
            entry["anomaly_ratio"] = float(flagged.mean())
        summary["videos"][path] = entry
        if save_timelines and len(s):
            _save_timeline(s, threshold, out_dir / f"{Path(path).stem}_timeline.png")

    summary_path = out_dir / "batch_scores.json"
    summary_path.write_text(json.dumps(summary, indent=2))
    print(f"Saved batch summary to: {summary_path}")
    return summary


def _save_timeline(scores: np.ndarray, threshold: Optional[float], path: Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(12, 4))
    plt.plot(scores, "b-", linewidth=0.5)
    if threshold is not None:
        plt.axhline(threshold, color="r", linestyle="--", linewidth=0.8,
                    label=f"calibrated threshold {threshold:.6f}")
        plt.legend(loc="upper right")
    plt.xlabel("Frame")
    plt.ylabel("Anomaly Score")
    plt.title("Anomaly Score Timeline")
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    plt.savefig(path, dpi=150)
    plt.close()
