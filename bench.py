"""Headline benchmark: 720p ConvLSTM video scoring throughput per chip.

Workload (BASELINE.json north star): frames originate from a synthetic
720p video, are resized to the model's 256x256 input, and stream through
the ConvLSTM autoencoder scoring path (per-frame anomaly scores) as a
batch of parallel streams — the multi-camera serving scenario.

Measured quantity: device-pipeline frames/sec/chip at steady state
(frames resident as uint8, normalization + forward on device, scores
back to host).  Host video decode is excluded — this container has a
single CPU core, so including cv2 decode would benchmark OpenCV, not the
TPU; the streaming path that overlaps decode with compute is exercised in
tests/test_e2e_video.py and evaluate_video --video.

vs_baseline: ratio against the reference-equivalent torch model scoring
the same frames on CPU, forward-only, non-overlapping windows (its best
case; measured once and cached in BASELINE_MEASURED.json).

Both recurrence backends (XLA scan and the fused Pallas kernel) are
measured and printed as separate config lines with analytic MFU (model
FLOPs / v5e bf16 peak), at both 16- and 64-frame windows (BASELINE.json
configs[4]), plus an image-scoring line (the /v1/images serving path) so
the README's image figure is driver-tracked, plus a stride2-stem scoring
line (the TPU-first architecture variant — its own FLOP count, never the
headline, which stays the reference-shaped model), plus three video
TRAINING-step lines (f32, --precision bf16, and bf16 + --stem stride2; MFU
counts forward+backward as 3x forward FLOPs of the stem actually measured), plus
an end-to-end decode-INCLUDED single-stream mp4 line (host cv2 decode
overlapped with device compute — the honest system number on this 1-core
host, with its decode-only ceiling and achieved overlap fraction); the
FINAL line is the headline JSON the driver parses (best video SCORING
config):
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N,
     "mfu": ..., "flops_per_frame": ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_source_frames(n_frames: int, image_size: int) -> np.ndarray:
    """uint8 frame buffer standing in for decoded+resized 720p streams."""
    try:
        import cv2

        from vad_tpu.data.synthetic import create_synthetic_video_file

        path = "/tmp/vad_bench_720p.mp4"
        create_synthetic_video_file(path, n_frames=n_frames, image_size=720, seed=0)
        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frame = cv2.resize(frame, (image_size, image_size), interpolation=cv2.INTER_LINEAR)
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
        return np.stack(frames)
    except Exception:  # pragma: no cover - decode-less fallback
        rng = np.random.default_rng(0)
        return rng.integers(0, 255, size=(n_frames, image_size, image_size, 3), dtype=np.uint8)


def model_flops_per_frame(image_size: int = 256, stem: str = "pool") -> float:
    """Analytic forward FLOPs per frame of the video scoring pipeline.

    Counts the MXU work (convs, ConvTransposes, ConvLSTM gate convs) of
    VideoAutoencoder at default widths; elementwise/BN/gate math is
    excluded (<2%%).  Used to report MFU alongside frames/s.  The stride2
    stem's encoder convs emit at half resolution (no pool), so that model
    does 1/4 the encoder conv MACs — its MFU must use its own count.
    """
    f = 0.0
    hw = image_size * image_size
    # encoder: 4x conv3x3, channels 3/32/64/128 -> 32/64/128/128; 'pool'
    # computes at full res before each 2x2 pool, 'stride2' emits at half res
    chans = [(3, 32), (32, 64), (64, 128), (128, 128)]
    res = hw
    for cin, cout in chans:
        out_res = res if stem == "pool" else res // 4
        f += out_res * cin * 9 * cout * 2
        res //= 4
    # convlstm: 2 layers x (input conv + hidden conv), 3x3, 128 -> 512 at H/16
    lat_hw = hw // 256
    f += 2 * 2 * (lat_hw * 128 * 9 * 512 * 2)
    # decoder: 4x convtranspose 2x2 stride 2, channels 128/128/64/32 -> 128/64/32/3
    dchans = [(128, 128), (128, 64), (64, 32), (32, 3)]
    res = lat_hw
    for cin, cout in dchans:
        f += res * cin * 4 * cout * 2
        res *= 4
    return f


def image_model_flops(image_size: int = 256, latent: int = 256) -> float:
    """Analytic forward MXU FLOPs per image of ConvAutoencoder (double-conv
    encoder blocks 3->32->64->128->latent, ConvT+Conv decoder mirror)."""
    f = 0.0
    res = image_size * image_size
    cin = 3
    for cout in (32, 64, 128, latent):
        f += res * cin * 9 * cout * 2      # conv1 3x3
        f += res * cout * 9 * cout * 2     # conv2 3x3
        res //= 4
        cin = cout
    # decoder: 3x [ConvT 2x2 stride2 + Conv3x3 refine], then the final
    # ConvT(32) + Conv3x3 -> out_channels (models/autoencoder.py:106-116)
    cin = latent
    for cout in (128, 64, 32):
        res *= 4
        # ConvT 2x2 stride 2: each output pixel reads ONE input pixel
        # through one tap -> res_out * cin * cout * 2 (matches the
        # res_in * 4 * ... convention in model_flops_per_frame)
        f += res * cin * cout * 2
        f += res * cout * 9 * cout * 2     # refine conv 3x3
        cin = cout
    res *= 4
    f += res * cin * 32 * 2
    f += res * 32 * 9 * 3 * 2
    return f


V5E_PEAK_BF16_FLOPS = 197e12  # per chip


def main() -> None:
    import os
    import threading

    # fail fast with a diagnostic if the device cannot be attached: a
    # wedged/unavailable remote TPU otherwise blocks silently inside
    # backend init for ~30 minutes (observed), which reads as a hang
    attached = threading.Event()

    def _watchdog() -> None:
        if not attached.wait(600):
            print(json.dumps({
                "error": "TPU attach timed out after 600 s "
                         "(backend wedged or unavailable); no benchmark run"
            }), flush=True)
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    from vad_tpu.models.video_autoencoder import ConvLSTM, VideoAutoencoder
    from vad_tpu.utils.precision import cast_floating

    jax.devices()  # force backend init under the watchdog
    attached.set()

    image_size = 256
    streams = 16  # parallel camera streams per chip (saturation point on v5e)
    n_source = 128

    # serving precision policy: bf16 activations/params (2x MXU, half the
    # HBM traffic; scores track f32 within ~1%% — tests/test_serving.py),
    # f32 cell state inside the recurrence (scan carry / Pallas scratch).
    dtype = jnp.bfloat16
    lat = image_size // 16

    src = make_source_frames(n_source, image_size)

    def make_chunks(chunk_t: int, n: int = 4):
        """[streams, T, H, W, 3] uint8 chunks cycled from the source buffer."""

        def chunk_at(i: int) -> np.ndarray:
            idx = (np.arange(chunk_t) + i * chunk_t) % len(src)
            one = src[idx]
            return np.broadcast_to(one, (streams, *one.shape)).copy()

        return [jnp.asarray(chunk_at(i)) for i in range(n)]

    def measure(backend: str, fused_input: bool = False, chunk_t: int = 16,
                stem: str = "pool") -> float:
        """Best-window steady-state fps for one configuration."""
        chunks = make_chunks(chunk_t)
        model = VideoAutoencoder(backend=backend, stem=stem)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 2, image_size, image_size, 3)), train=False
        )
        cast_vars = cast_floating(variables, dtype)

        if fused_input:
            from vad_tpu.ops.encoder_pallas import fold_from_variables

            w_band, bias_folded = fold_from_variables(variables)
            w_band = jnp.asarray(w_band, jnp.float32).astype(dtype)
            bias_folded = jnp.asarray(bias_folded, jnp.float32)

            def scoring_step(v, u8_chunk, states):
                s, t, h, w, _ = u8_chunk.shape
                _, _, frame_scores, new_states = model.apply(
                    v, u8_chunk.reshape(s, t, h, w * 3), states, w_band,
                    bias_folded, False,
                    method=VideoAutoencoder.stream_step_u8,
                )
                return frame_scores.astype(jnp.float32), new_states

        else:

            def scoring_step(v, u8_chunk, states):
                x = u8_chunk.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
                _, _, frame_scores, new_states = model.apply(
                    v, x, states, method=VideoAutoencoder.stream_step
                )
                return frame_scores.astype(jnp.float32), new_states

        variables = cast_vars
        step = jax.jit(scoring_step)
        states = ConvLSTM.zero_state(
            model.lstm_layers, streams, lat, lat, model.lstm_hidden_dim,
            dtype=jnp.float32,
        )

        # warm-up / compile (np.asarray = real device->host fetch; plain
        # block_until_ready has proven unreliable as a barrier under the
        # remote-TPU tunnel this runs through)
        scores, states = step(variables, chunks[0], states)
        np.asarray(scores)

        # steady-state measurement: states chain serializes the steps, the
        # final fetch is the barrier.  The TPU here sits behind a remote
        # tunnel with large run-to-run latency variance, so take several
        # windows and report the best (closest to device capability).
        n_iters = max(4, 320 // chunk_t)  # ~same frames per window across T
        best_dt = float("inf")
        for _ in range(4):
            t0 = time.time()
            for i in range(n_iters):
                scores, states = step(variables, chunks[i % len(chunks)], states)
            np.asarray(scores)
            best_dt = min(best_dt, time.time() - t0)
        return n_iters * streams * chunk_t / best_dt

    def measure_image(batch: int = 256) -> float:
        """Steady-state image-scoring throughput (stateless conv AE path,
        the workload behind serve.py's /v1/images endpoint)."""
        from vad_tpu.models.autoencoder import ConvAutoencoder

        model = ConvAutoencoder()
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, image_size, image_size, 3)), train=False
        )
        variables = cast_floating(variables, dtype)

        def score(v, u8):
            x = u8.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
            return model.apply(
                v, x, method=ConvAutoencoder.reconstruction_error
            ).astype(jnp.float32)

        step = jax.jit(score)
        bufs = [
            jnp.asarray(src[(np.arange(batch) + 37 * i) % len(src)]) for i in range(4)
        ]
        s = step(variables, bufs[0])
        np.asarray(s)  # compile barrier
        n_iters = 12
        best_dt = float("inf")
        for _ in range(4):
            t0 = time.time()
            for i in range(n_iters):
                s = step(variables, bufs[i % len(bufs)])
            np.asarray(s)
            best_dt = min(best_dt, time.time() - t0)
        return n_iters * batch / best_dt

    def measure_e2e_mp4(n_frames: int = 512, chunk_t: int = 16):
        """End-to-end SINGLE-STREAM system throughput: mp4 in -> per-frame
        scores out, host cv2 decode (one CPU core) overlapped with device
        compute through the double-buffered streaming path
        (eval/video_render.iter_video_chunks + stream_step — the exact
        pipeline behind evaluate_video --video).  This is the workload the
        reference's generate_video_output runs (evaluate_video.py:309-404,
        minus its 16x per-frame re-scoring); unlike the device-pipeline
        lines above it INCLUDES the host side both systems must pay.

        Returns (e2e_fps, decode_only_fps): the second number is the same
        iterator with no device work — on this 1-core host it is the hard
        ceiling, and e2e/decode_only is the achieved overlap fraction.
        """
        from vad_tpu.data.synthetic import create_synthetic_video_file
        from vad_tpu.eval.video_render import iter_device_chunks, iter_video_chunks
        from vad_tpu.ops.convlstm_pallas import preferred_backend

        path = "/tmp/vad_bench_720p_e2e.mp4"
        create_synthetic_video_file(path, n_frames=n_frames, image_size=720, seed=0)

        # decode-only ceiling (same thread structure, device work skipped)
        t0 = time.time()
        n_dec = 0
        for _, n_valid in iter_video_chunks(path, chunk_t, image_size):
            n_dec += n_valid
        decode_s = time.time() - t0

        model = VideoAutoencoder(backend=preferred_backend(lat, lat, 128))
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 2, image_size, image_size, 3)), train=False
        )
        variables = cast_floating(variables, dtype)

        def scoring_step(v, u8_chunk, states):
            x = u8_chunk.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
            _, _, frame_scores, new_states = model.apply(
                v, x, states, method=VideoAutoencoder.stream_step
            )
            return frame_scores.astype(jnp.float32), new_states

        step = jax.jit(scoring_step)
        zero = ConvLSTM.zero_state(
            model.lstm_layers, 1, lat, lat, model.lstm_hidden_dim, dtype=jnp.float32
        )
        s, _ = step(variables, jnp.zeros((1, chunk_t, image_size, image_size, 3), jnp.uint8), zero)
        np.asarray(s)  # compile barrier (outside the timed window)

        states = zero
        n_scored = 0
        t0 = time.time()
        # iter_device_chunks stages the host->device copy on its own
        # thread (round-4 weak #3: the synchronous per-chunk transfer
        # through the remote-TPU tunnel was most of the non-decode wall)
        for _, dev, n_valid in iter_device_chunks(path, chunk_t, image_size):
            s, states = step(variables, dev, states)
            n_scored += n_valid
        np.asarray(s)  # final fetch = barrier; per-chunk dispatch is async
        wall = time.time() - t0
        assert n_scored == n_dec
        return n_scored / wall, n_dec / decode_s

    def measure_e2e_multistream(n_streams: int = 4, n_frames: int = 256,
                                chunk_t: int = 16):
        """End-to-end N-STREAM system throughput: N distinct mp4 files
        decoded concurrently (N cv2 threads on this 1-core host), their
        chunks batched into one [N, T, H, W, 3] device step that carries
        N independent ConvLSTM states — the multi-camera serving question
        BENCH's device-pipeline headline deliberately excludes the host
        from (round-4 VERDICT directive #3: how many real mp4 streams
        does this host+chip sustain?).

        Returns (aggregate_fps, aggregate_decode_only_fps).  The second
        number is the same N concurrent decoders with no device work —
        the host ceiling; device capability is ~18k f/s (headline), so
        whenever aggregate_fps approaches the ceiling the named
        bottleneck is host decode, not the chip.
        """
        import queue as queue_mod
        import threading

        from vad_tpu.data.synthetic import create_synthetic_video_file
        from vad_tpu.eval.video_render import iter_video_chunks
        from vad_tpu.ops.convlstm_pallas import preferred_backend

        paths = []
        for i in range(n_streams):
            p = f"/tmp/vad_bench_720p_ms{i}.mp4"
            create_synthetic_video_file(p, n_frames=n_frames, image_size=720, seed=i)
            paths.append(p)

        def make_iters():
            return [iter_video_chunks(p, chunk_t, image_size) for p in paths]

        # aggregate decode-only ceiling: N concurrent decode threads
        t0 = time.time()
        n_dec = 0
        for parts in zip(*make_iters()):
            n_dec += sum(nv for _, nv in parts)
        decode_s = time.time() - t0

        model = VideoAutoencoder(backend=preferred_backend(lat, lat, 128))
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 2, image_size, image_size, 3)), train=False
        )
        variables = cast_floating(variables, dtype)

        def scoring_step(v, u8_chunk, states):
            x = u8_chunk.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
            _, _, frame_scores, new_states = model.apply(
                v, x, states, method=VideoAutoencoder.stream_step
            )
            return frame_scores.astype(jnp.float32), new_states

        step = jax.jit(scoring_step)
        zero = ConvLSTM.zero_state(
            model.lstm_layers, n_streams, lat, lat, model.lstm_hidden_dim,
            dtype=jnp.float32,
        )
        s, _ = step(
            variables,
            jnp.zeros((n_streams, chunk_t, image_size, image_size, 3), jnp.uint8),
            zero,
        )
        np.asarray(s)  # compile barrier (outside the timed window)

        # staged pipeline: N decoders -> stack+transfer thread -> dispatch
        dq: queue_mod.Queue = queue_mod.Queue(maxsize=2)
        sentinel = object()
        err = []

        def produce() -> None:
            try:
                for parts in zip(*make_iters()):
                    bufs = np.stack([b for b, _ in parts])
                    dq.put((jax.device_put(bufs), sum(nv for _, nv in parts)))
            except BaseException as e:  # noqa: BLE001
                err.append(e)
            finally:
                dq.put(sentinel)

        threading.Thread(target=produce, daemon=True).start()
        states = zero
        n_scored = 0
        t0 = time.time()
        while True:
            item = dq.get()
            if item is sentinel:
                break
            dev, nv = item
            s, states = step(variables, dev, states)
            n_scored += nv
        np.asarray(s)  # final fetch = barrier
        wall = time.time() - t0
        if err:
            raise err[0]
        assert n_scored == n_dec
        return n_scored / wall, n_dec / decode_s

    def measure_train(
        compute_dtype=None, batch: int = 8, chunk_t: int = 16, stem: str = "pool"
    ) -> float:
        """Steady-state video TRAINING-step throughput (forward + backward +
        Adam + BN-stat update, the compiled step behind train_video.py).
        Driver-tracks the --precision bf16 mixed-precision win alongside the
        f32 reference-parity default, plus the --stem stride2 variant that
        removes the round-3 profiled pool floors."""
        from vad_tpu.ops.convlstm_pallas import preferred_backend
        from vad_tpu.ops.losses import make_per_sample_loss_fn
        from vad_tpu.parallel.sharding import get_mesh, train_state_shardings
        from vad_tpu.train.state import create_train_state
        from vad_tpu.train.steps import make_train_step, u8_normalize

        model = VideoAutoencoder(backend=preferred_backend(lat, lat, 128), stem=stem)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 2, image_size, image_size, 3)), train=False
        )
        mesh = get_mesh()
        state = create_train_state(model, variables, 1e-4, weight_decay=1e-5)
        step = make_train_step(
            make_per_sample_loss_fn("mse", 0.5), mesh, preprocess=u8_normalize,
            state_shardings=train_state_shardings(state, mesh),
            compute_dtype=compute_dtype,
        )
        bufs = [
            jnp.asarray(np.broadcast_to(
                src[(np.arange(chunk_t) + 37 * i) % len(src)],
                (batch, chunk_t, image_size, image_size, 3),
            ).copy())
            for i in range(2)
        ]
        n_real = jnp.asarray(batch, jnp.int32)
        state, loss = step(state, bufs[0], n_real)
        np.asarray(loss)  # compile barrier
        n_iters = 8
        best_dt = float("inf")
        for _ in range(3):
            t0 = time.time()
            for i in range(n_iters):
                state, loss = step(state, bufs[i % 2], n_real)
            np.asarray(loss)
            best_dt = min(best_dt, time.time() - t0)
        return n_iters * batch * chunk_t / best_dt

    flops_frame = model_flops_per_frame(image_size)

    def mfu(fps: float) -> float:
        return fps * flops_frame / V5E_PEAK_BF16_FLOPS

    configs = {
        "fused input block + fused-pallas recurrence, bf16": ("pallas", True, 16),
        "fused-pallas recurrence, bf16": ("pallas", False, 16),
        "xla scan recurrence, bf16": ("xla", False, 16),
        # BASELINE.json configs[4] names 64-frame windows: prove the fused
        # kernel's VMEM/tiling behavior holds at T=64 (it scans per frame,
        # so T only lengthens the scan — measured, not assumed)
        "fused-pallas recurrence, bf16, 64-frame windows": ("pallas", False, 64),
        "xla scan recurrence, bf16, 64-frame windows": ("xla", False, 64),
    }
    results = {}
    for name, (backend, fused, chunk_t) in configs.items():
        results[name] = measure(backend, fused, chunk_t)
        print(json.dumps({
            "config": name,
            "value": round(results[name], 1), "unit": "frames/s/chip",
            "mfu": round(mfu(results[name]), 3),
        }), flush=True)

    # the TPU-first stem (--stem stride2): a different (equally-accurate at
    # the parity budget — results/experiments/stride2_stem.md) function, so
    # it is reported as its own line with its own FLOP count, and never
    # competes for the reference-shaped headline below.
    stride2_fps = measure("pallas", False, 16, stem="stride2")
    stride2_flops = model_flops_per_frame(image_size, stem="stride2")
    print(json.dumps({
        "config": "fused-pallas recurrence, bf16, stride2 stem",
        "value": round(stride2_fps, 1), "unit": "frames/s/chip",
        "mfu": round(stride2_fps * stride2_flops / V5E_PEAK_BF16_FLOPS, 3),
    }), flush=True)

    image_fps = measure_image()
    image_flops = image_model_flops(image_size)
    print(json.dumps({
        "config": "image scoring, bf16, batch 256",
        "value": round(image_fps, 1), "unit": "images/s/chip",
        "mfu": round(image_fps * image_flops / V5E_PEAK_BF16_FLOPS, 3),
    }), flush=True)

    # training throughput: forward+backward+Adam ~= 3x forward FLOPs
    for train_name, cdt, stem in (
        ("video training step, f32, B=8", None, "pool"),
        ("video training step, bf16 mixed precision, B=8", jnp.bfloat16, "pool"),
        ("video training step, bf16, stride2 stem, B=8", jnp.bfloat16, "stride2"),
    ):
        train_fps = measure_train(cdt, stem=stem)
        stem_flops = model_flops_per_frame(image_size, stem=stem)
        print(json.dumps({
            "config": train_name,
            "value": round(train_fps, 1), "unit": "frames/s/chip",
            "mfu": round(train_fps * 3 * stem_flops / V5E_PEAK_BF16_FLOPS, 3),
        }), flush=True)

    # end-to-end, decode-included (VERDICT r3 #5): the honest system number.
    # On this 1-core host it is decode-bound; the overlap fraction states how
    # much of the decode ceiling the async device pipeline preserves.
    e2e_fps, decode_fps = measure_e2e_mp4()
    print(json.dumps({
        "config": "end-to-end single-stream mp4 (host decode overlapped)",
        "value": round(e2e_fps, 1), "unit": "frames/s",
        "decode_only_fps": round(decode_fps, 1),
        "overlap_fraction": round(e2e_fps / decode_fps, 3),
    }), flush=True)

    # end-to-end, N real mp4 streams (VERDICT r4 #3): the system-level
    # serving number — aggregate fps across concurrent decoders and where
    # it saturates (host cores vs device).
    n_streams = 4
    ms_fps, ms_decode_fps = measure_e2e_multistream(n_streams)
    print(json.dumps({
        "config": f"end-to-end {n_streams}-stream mp4 (aggregate, decode included)",
        "value": round(ms_fps, 1), "unit": "frames/s",
        "n_streams": n_streams,
        "decode_only_fps": round(ms_decode_fps, 1),
        "overlap_fraction": round(ms_fps / ms_decode_fps, 3),
        "bottleneck": (
            "host decode (1 core)" if ms_fps / ms_decode_fps >= 0.8
            else "host non-decode overhead"
        ),
    }), flush=True)

    fps = max(results.values())

    from vad_tpu.utils.baseline_torch import measure_reference_cpu_fps

    baseline_fps = measure_reference_cpu_fps(image_size=image_size, sequence_length=16)

    result = {
        "metric": "720p-video ConvLSTM scoring throughput (device pipeline)",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / baseline_fps, 1),
        "mfu": round(mfu(fps), 3),
        "flops_per_frame": flops_frame,
        "image_scoring_fps": round(image_fps, 1),
        "stride2_scoring_fps": round(stride2_fps, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
