"""Attribute the end-to-end mp4 host gap (round-4 VERDICT weak #3 / #2).

BENCH_r04's decode-included line reached 311 f/s against a 978 f/s
decode-only ceiling (overlap 0.318): ~68% of wall was NON-decode host
work, unattributed.  This profiles every stage of the single-stream
pipeline in isolation on the real TPU and writes the attribution table
to results/experiments/e2e_host_gap.md:

- decode-only: the iter_video_chunks producer with no consumer work
  (the hard ceiling on this 1-core host);
- transfer-only: jax.device_put of pre-decoded chunks (the remote-TPU
  tunnel's host->device bandwidth cost);
- dispatch+compute-only: the jitted scoring step over device-resident
  chunks (the pure device pipeline, no host);
- decode+transfer (no compute): both host stages overlapped;
- e2e SYNC transfer: the round-4 loop (jnp.asarray on the consumer
  thread) — reproduces the 0.318-overlap configuration;
- e2e STAGED transfer: iter_device_chunks (transfer on its own thread)
  — the round-5 fix.

Usage: python tools/profile_e2e.py [--frames 512] [--chunk 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))  # vad_tpu imports when run from anywhere
RECORD = REPO / "results" / "experiments" / "e2e_host_gap.md"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vad_tpu.data.synthetic import create_synthetic_video_file
    from vad_tpu.eval.video_render import iter_device_chunks, iter_video_chunks
    from vad_tpu.models.video_autoencoder import ConvLSTM, VideoAutoencoder
    from vad_tpu.ops.convlstm_pallas import preferred_backend
    from vad_tpu.utils.precision import cast_floating

    size = args.image_size
    chunk_t = args.chunk
    lat = size // 16
    dtype = jnp.bfloat16
    path = "/tmp/vad_profile_720p_e2e.mp4"
    create_synthetic_video_file(path, n_frames=args.frames, image_size=720, seed=0)

    rows = []

    def record(name: str, frames: int, secs: float, note: str) -> float:
        fps = frames / secs
        rows.append((name, frames, secs, fps, note))
        print(f"{name:34s} {fps:8.1f} f/s  ({secs:.2f} s)  {note}", flush=True)
        return fps

    # --- decode-only ceiling -------------------------------------------
    t0 = time.time()
    n_dec = 0
    chunks = []  # keep decoded chunks for the transfer-only stage
    for buf, n_valid in iter_video_chunks(path, chunk_t, size):
        n_dec += n_valid
        if len(chunks) < 8:
            chunks.append(buf.copy())
    decode_fps = record("decode-only", n_dec, time.time() - t0,
                        "cv2 read+cvt+resize, 1 core")

    # --- transfer-only (tunnel H2D bandwidth) --------------------------
    devs = [jax.device_put(c[None]) for c in chunks]  # warm the path
    for d in devs:
        np.asarray(d[0, 0, 0, 0])  # ensure materialized
    n_rep = max(1, n_dec // (len(chunks) * chunk_t))
    t0 = time.time()
    for _ in range(n_rep):
        for c in chunks:
            d = jax.device_put(c[None])
            d.block_until_ready()
    tr_s = time.time() - t0
    n_tr = n_rep * len(chunks) * chunk_t
    mb = n_tr * size * size * 3 / 1e6
    record("transfer-only (sync device_put)", n_tr, tr_s,
           f"{mb / tr_s:.0f} MB/s H2D through the tunnel")

    # --- transfer-size sweep: is the ~100 MB/s RPC-overhead-bound? -----
    sweep = []
    for frames_per_put in (1, 4, 16, 64):
        buf = np.ascontiguousarray(
            np.repeat(chunks[0], max(1, frames_per_put // chunk_t), axis=0)
        )[:frames_per_put]
        d = jax.device_put(buf)
        d.block_until_ready()  # warm
        reps = max(2, 128 // frames_per_put)
        t0 = time.time()
        for _ in range(reps):
            d = jax.device_put(buf)
            d.block_until_ready()
        dt = time.time() - t0
        mbs = reps * buf.nbytes / 1e6 / dt
        sweep.append((frames_per_put, buf.nbytes / 1e6, mbs))
        print(f"device_put {frames_per_put:3d} frames ({buf.nbytes/1e6:6.1f} MB): "
              f"{mbs:7.1f} MB/s", flush=True)

    # --- dispatch+compute-only (device pipeline) -----------------------
    model = VideoAutoencoder(backend=preferred_backend(lat, lat, 128))
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 2, size, size, 3)), train=False
    )
    variables = cast_floating(variables, dtype)

    def scoring_step(v, u8_chunk, states):
        x = u8_chunk.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
        _, _, fs, ns = model.apply(v, x, states, method=VideoAutoencoder.stream_step)
        return fs.astype(jnp.float32), ns

    step = jax.jit(scoring_step)
    zero = ConvLSTM.zero_state(model.lstm_layers, 1, lat, lat,
                               model.lstm_hidden_dim, dtype=jnp.float32)
    s, _ = step(variables, devs[0], zero)
    np.asarray(s)  # compile barrier
    states = zero
    t0 = time.time()
    for i in range(n_rep * len(chunks)):
        s, states = step(variables, devs[i % len(devs)], states)
    np.asarray(s)
    record("dispatch+compute-only", n_rep * len(chunks) * chunk_t,
           time.time() - t0, "device-resident chunks, states chained")

    # --- decode + transfer, no compute ---------------------------------
    t0 = time.time()
    n = 0
    for _, dev, n_valid in iter_device_chunks(path, chunk_t, size):
        n += n_valid
    record("decode+staged-transfer (no compute)", n, time.time() - t0,
           "both host stages overlapped")

    # --- full e2e, round-4 style (sync transfer on consumer thread) ----
    states = zero
    t0 = time.time()
    n = 0
    for buf, n_valid in iter_video_chunks(path, chunk_t, size):
        s, states = step(variables, jnp.asarray(buf[None]), states)
        n += n_valid
    np.asarray(s)
    sync_fps = record("e2e, SYNC transfer (round-4 loop)", n, time.time() - t0,
                      "jnp.asarray on the consumer thread")

    # --- full e2e, staged transfer (round-5 fix) -----------------------
    states = zero
    t0 = time.time()
    n = 0
    for _, dev, n_valid in iter_device_chunks(path, chunk_t, size):
        s, states = step(variables, dev, states)
        n += n_valid
    np.asarray(s)
    staged_fps = record("e2e, STAGED transfer (round-5)", n, time.time() - t0,
                        "device_put on its own thread")

    sweep_lines = [
        "",
        "Transfer-size sweep (is the H2D rate RPC-overhead-bound?):",
        "",
        "| frames/put | MB/put | MB/s |",
        "|---|---|---|",
    ] + [f"| {f} | {mb:.1f} | {mbs:.1f} |" for f, mb, mbs in sweep]

    lines = [
        "# End-to-end mp4 host-gap attribution (round 5)",
        "",
        "Round-4 BENCH's decode-included line sat at overlap fraction 0.318",
        "(311 f/s vs a 978 f/s decode-only ceiling) with ~68% of wall",
        "unattributed non-decode host work.  Per-stage isolation on the real",
        f"TPU ({args.frames} frames of 720p mp4 resized to {size}px,",
        f"chunk T={chunk_t}, bf16 serving path):",
        "",
        "| stage | frames/s | note |",
        "|---|---|---|",
    ]
    for name, _f, _s, fps, note in rows:
        lines.append(f"| {name} | {fps:.1f} | {note} |")
    lines += sweep_lines
    lines += [
        "",
        f"- overlap fraction, sync transfer (round-4 loop): "
        f"**{sync_fps / decode_fps:.3f}**",
        f"- overlap fraction, staged transfer (round-5 fix): "
        f"**{staged_fps / decode_fps:.3f}**",
        "",
        "Interpretation: the transfer-only row is the host->device copy of",
        "u8 chunks through the remote-TPU tunnel.  In the round-4 loop that",
        "copy ran synchronously on the consumer thread, serializing with",
        "decode; `iter_device_chunks` moves it to its own pipeline stage so",
        "decode, transfer, and device compute overlap.  Reproduce:",
        "`python tools/profile_e2e.py`.",
        "",
        "Measured-and-rejected (round 5): slab-batched transfer.  The sweep",
        "above shows the tunnel H2D path is RPC-overhead-bound (7→78 MB/s",
        "from 1→64 frames per put), which motivated batching 4 chunks into",
        "one 64-frame device_put sliced back out device-side.  In-process",
        "A/B (512 frames, 3 reps each): slab=1 387/401/386 f/s stable,",
        "slab=4 243/300/449 erratic — NO win.  The pipelined put is already",
        "asynchronous to decode and compute, so the per-put overhead it",
        "would amortize is off the critical path, while the accumulate+burst",
        "adds pipeline stalls (and the consumer prefetch queue back-pressure",
        "amplifies them).  The simple per-chunk staged put stays.",
        "",
        "Caveat on absolute numbers: tunnel throughput drifts run to run",
        "(the same decode-only stage measured 743-849 f/s across round-5",
        "sessions; identical training draws ranged 303-1100 s).  Only",
        "within-run comparisons are load-bearing; the committed bench line",
        "reports decode_only_fps alongside e2e for exactly this reason.",
        "",
    ]
    RECORD.parent.mkdir(parents=True, exist_ok=True)
    RECORD.write_text("\n".join(lines))
    (RECORD.parent / "e2e_host_gap.json").write_text(json.dumps(
        {name: {"fps": round(fps, 1), "seconds": round(secs, 2), "note": note}
         for name, _n, secs, fps, note in rows}, indent=2) + "\n")
    print(f"wrote {RECORD}")


if __name__ == "__main__":
    main()
