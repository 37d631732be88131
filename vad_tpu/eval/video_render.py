"""Streaming long-video scoring + annotated video rendering.

Output parity with reference evaluate_video.py:309-404: an mp4 with three
panels (original | reconstruction | JET error heatmap) over a score bar
(score normalized against 0.01, green/orange/red thresholds), plus
score_timeline.png.

The compute path is redesigned (SURVEY §3.4): the reference slides
stride-1 windows, re-decoding and re-scoring every frame sequence_length
times and writing duplicated frames.  Here the video streams through the
model in chunks with the ConvLSTM (h, c) carried across chunk boundaries —
mathematically one continuous recurrence over the whole video — while a
background thread decodes the next chunk (double buffering).  Every frame
is decoded, scored, and written exactly once.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from vad_tpu.eval.video_eval import create_heatmap, denormalize_u8
from vad_tpu.models.video_autoencoder import ConvLSTM, VideoAutoencoder


def iter_video_chunks(
    video_path: str,
    chunk: int,
    image_size: int,
    prefetch: int = 2,
) -> Iterator[Tuple[np.ndarray, int]]:
    """Yield (raw-resized uint8 [chunk,H,W,3], n_valid) with a background
    decode thread; normalization happens on device.

    The final short chunk is padded by repeating its last frame so device
    shapes stay static; n_valid marks the real frames.
    """
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    sentinel = object()
    err = []

    def produce() -> None:
        cap = cv2.VideoCapture(video_path)
        try:
            raw_buf = []
            while True:
                ok, frame = cap.read()
                if ok:
                    # resize BEFORE the BGR->RGB conversion: both are
                    # per-pixel host work, so converting at 256^2 instead
                    # of the source 720^2 cuts that stage ~8x (resize is
                    # channel-order-agnostic; same pixels either way)
                    if frame.shape[:2] != (image_size, image_size):
                        frame = cv2.resize(frame, (image_size, image_size),
                                           interpolation=cv2.INTER_LINEAR)
                    raw_buf.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
                if len(raw_buf) == chunk or (not ok and raw_buf):
                    n_valid = len(raw_buf)
                    while len(raw_buf) < chunk:
                        raw_buf.append(raw_buf[-1])
                    q.put((np.stack(raw_buf), n_valid))
                    raw_buf = []
                if not ok:
                    break
        except BaseException as e:  # noqa: BLE001 - surfaced to consumer
            err.append(e)
        finally:
            cap.release()
            q.put(sentinel)

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def iter_device_chunks(
    video_path: str,
    chunk: int,
    image_size: int,
    prefetch: int = 2,
) -> Iterator[Tuple[np.ndarray, jax.Array, int]]:
    """`iter_video_chunks` plus a background host->device TRANSFER stage.

    Yields (raw uint8 [chunk,H,W,3], device uint8 [1,chunk,H,W,3],
    n_valid).  The ``jax.device_put`` runs on its own thread, so the
    host->device copy — which through this setup's remote-TPU tunnel
    costs a nontrivial fraction of a chunk's wall time — overlaps both
    the cv2 decode of the next chunk and the device compute of the
    previous one, instead of sitting on the consumer's critical path.
    (Round-4 VERDICT weak #3: 68% of the e2e wall was non-decode host
    work; the synchronous per-chunk `jnp.asarray` was the largest part.)

    Measured-and-rejected: batching 4 chunks into one 64-frame slab
    device_put (motivated by the synchronous put-size sweep showing the
    tunnel is RPC-overhead-bound: 7→78 MB/s from 1→64 frames/put) does
    NOT help here — in-process A/B, 512 frames x3 reps: slab=1 gives a
    stable 387/401/386 f/s vs slab=4's erratic 243/300/449.  The
    pipelined put is already asynchronous to decode and compute, so the
    per-put overhead it would amortize is off the critical path, while
    the 4-chunk accumulate+burst adds pipeline stalls.  Details in
    results/experiments/e2e_host_gap.md.
    """
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    sentinel = object()
    err = []

    def produce() -> None:
        try:
            for raw, n_valid in iter_video_chunks(
                video_path, chunk, image_size, prefetch
            ):
                q.put((raw, jax.device_put(raw[None]), n_valid))
        except BaseException as e:  # noqa: BLE001 - surfaced to consumer
            err.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def stream_scores(
    model: VideoAutoencoder,
    variables,
    video_path: str,
    image_size: int,
    chunk: int = 16,
    on_frame=None,
    objective: str = "reconstruct",
) -> np.ndarray:
    """Score every frame of a video once, carrying ConvLSTM state.

    Returns per-frame scores [N].  ``on_frame(orig_u8, recon_u8, err_map,
    score)`` is invoked per real frame if given (rendering hook).

    objective='predict' scores frame t against the model's causal output
    at t-1 (its prediction of frame t), carried across chunk boundaries;
    the very first frame has no prediction and borrows frame 1's score.
    """
    lat = image_size // 16
    predict = objective == "predict"

    @jax.jit
    def step(v, u8, states, prev_pred):
        x = u8.astype(jnp.float32) / 127.5 - 1.0  # normalize on device
        recon, err, fs, new_states = model.apply(
            v, x, states, method=VideoAutoencoder.stream_step
        )
        if predict:
            # prediction of frame t is the model output at t-1 (carried
            # across chunks via prev_pred)
            preds = jnp.concatenate([prev_pred, recon[:, :-1]], axis=1)
            err = jnp.mean(jnp.square(x - preds), axis=-1)
            fs = jnp.mean(err, axis=(2, 3))
            shown = preds
        else:
            shown = recon
        return shown, err, fs, new_states, recon[:, -1:]

    states = ConvLSTM.zero_state(model.lstm_layers, 1, lat, lat, model.lstm_hidden_dim)
    prev_pred = jnp.zeros((1, 1, image_size, image_size, 3), jnp.float32)
    scores: list[float] = []
    first_chunk = True
    for raw, dev, n_valid in iter_device_chunks(video_path, chunk, image_size):
        shown, err, frame_scores, states, prev_pred = step(
            variables, dev, states, prev_pred
        )
        fs = np.array(np.asarray(frame_scores)[0, :n_valid])
        if predict and first_chunk and len(fs) > 1:
            fs[0] = fs[1]  # frame 0 has no prediction
        first_chunk = False
        scores.extend(fs.tolist())
        if on_frame is not None:
            shown_np = np.asarray(shown)[0]
            err_np = np.asarray(err)[0]
            for t in range(n_valid):
                on_frame(raw[t], denormalize_u8(shown_np[t]), err_np[t], float(fs[t]))
    return np.asarray(scores)


def compose_annotated_frame(
    orig_u8: np.ndarray, recon_u8: np.ndarray, err_map: np.ndarray, score: float
) -> np.ndarray:
    """Three panels + 60px score bar, RGB (reference evaluate_video.py:
    355-381 layout: score/0.01 normalization, green/orange/red)."""
    size = orig_u8.shape[1::-1]
    heat = create_heatmap(err_map, size=size)
    combined = np.hstack([orig_u8, recon_u8, heat])
    w = combined.shape[1]
    bar = np.zeros((60, w, 3), dtype=np.uint8)
    score_norm = min(score / 0.01, 1.0)
    bar_width = int(score_norm * (w - 20))
    color = (
        (0, 255, 0) if score_norm < 0.5 else (255, 165, 0) if score_norm < 0.75 else (255, 0, 0)
    )
    cv2.rectangle(bar, (10, 20), (10 + bar_width, 50), color, -1)
    cv2.rectangle(bar, (10, 20), (w - 10, 50), (255, 255, 255), 2)
    cv2.putText(bar, f"Score: {score:.6f}", (10, 15), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                (255, 255, 255), 1)
    return np.vstack([combined, bar])


def generate_video_output(
    model: VideoAutoencoder,
    variables,
    video_path: str,
    output_path: str,
    image_size: int = 256,
    sequence_length: int = 16,
    fps: Optional[float] = None,
    objective: str = "reconstruct",
) -> np.ndarray:
    """Annotated side-by-side mp4 + score_timeline.png for one video."""
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("cv2 is required for video rendering")
    cap = cv2.VideoCapture(video_path)
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    if total < 1:
        print("Video too short for analysis")
        return np.zeros(0)

    frame_width = image_size * 3
    frame_height = image_size + 60
    writer = cv2.VideoWriter(
        str(output_path),
        cv2.VideoWriter_fourcc(*"mp4v"),
        fps or src_fps,
        (frame_width, frame_height),
    )
    print(f"Processing {total} frames (chunked, state-carrying stream)...")

    def on_frame(orig, recon, err, score):
        frame = compose_annotated_frame(orig, recon, err, score)
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))

    try:
        scores = stream_scores(
            model, variables, video_path, image_size, chunk=sequence_length,
            on_frame=on_frame, objective=objective,
        )
    finally:
        writer.release()
    print(f"Saved annotated video to: {output_path}")

    plt.figure(figsize=(12, 4))
    plt.plot(scores, "b-", linewidth=0.5)
    plt.xlabel("Frame")
    plt.ylabel("Anomaly Score")
    plt.title("Anomaly Score Timeline")
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    timeline_path = Path(output_path).parent / "score_timeline.png"
    plt.savefig(timeline_path, dpi=150)
    plt.close()
    print(f"Saved score timeline to: {timeline_path}")
    return scores
