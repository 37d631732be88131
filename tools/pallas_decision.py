"""Decide the fused-Pallas recurrence's fate with data (round-4 VERDICT #7).

BENCH_r04 showed the Pallas serving recurrence winning only ~1% end to
end (18,874 vs 18,688 f/s) — because the serving path is
encoder-dominated.  The open question: is there a regime where keeping
(h, c) VMEM-resident pays meaningfully — longer T (more scan steps per
dispatch), more streams (bigger M in the folded matmul), recurrence-only
workloads — or should the XLA scan be the default with the kernel kept
as a tested alternative?

Two measurements per (backend, streams, T) cell, bf16 serving precision:

- recurrence-only: the ConvLSTM stack applied to a PRE-COMPUTED latent
  input sequence [S, T, 16, 16, 128] (what the kernel actually
  accelerates, encoder/decoder excluded);
- full scoring step: `VideoAutoencoder.stream_step` on uint8 frames
  (what serving actually runs).

Writes results/experiments/pallas_decision.md with the grid and the
decision rule applied: the kernel stays the serving default only if it
wins >= 5% on the FULL step somewhere real; otherwise the default flips
to the XLA scan and the kernel is kept as an opt-in tested alternative.

Usage: python tools/pallas_decision.py  (real TPU, ~10 min)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))  # vad_tpu imports when run from anywhere
RECORD = REPO / "results" / "experiments" / "pallas_decision.md"

IMAGE_SIZE = 256
LAT = IMAGE_SIZE // 16
HIDDEN = 128


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vad_tpu.models.video_autoencoder import ConvLSTM, VideoAutoencoder
    from vad_tpu.utils.precision import cast_floating

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    def best_window(fn, barrier, n_iters: int, n_windows: int = 4) -> float:
        fn()  # warm/compile
        barrier()
        best = float("inf")
        for _ in range(n_windows):
            t0 = time.time()
            for _ in range(n_iters):
                fn()
            barrier()
            best = min(best, time.time() - t0)
        return best / n_iters

    def measure_recurrence(backend: str, streams: int, t: int) -> float:
        """us per (stream x frame) for the 2-layer ConvLSTM alone."""
        lstm = ConvLSTM(input_dim=HIDDEN, hidden_dim=HIDDEN, num_layers=2,
                        backend=backend)
        x = jnp.asarray(
            rng.standard_normal((streams, t, LAT, LAT, HIDDEN)), dtype
        )
        # init in f32 (fresh params are f32; bf16 input would hit a conv
        # dtype mismatch), then cast params down to the serving precision
        variables = lstm.init(jax.random.key(0), x[:, :2].astype(jnp.float32))
        variables = cast_floating(variables, dtype)
        state = {"s": None}

        @jax.jit
        def run(v, x):
            y = lstm.apply(v, x)
            return jnp.mean(y.astype(jnp.float32))

        def fn():
            state["s"] = run(variables, x)

        def barrier():
            np.asarray(state["s"])

        sec = best_window(fn, barrier, n_iters=max(2, 64 // t))
        return sec / (streams * t) * 1e6

    def measure_full(backend: str, streams: int, t: int) -> float:
        """frames/s for the full uint8 scoring step."""
        model = VideoAutoencoder(backend=backend)
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, 2, IMAGE_SIZE, IMAGE_SIZE, 3)),
            train=False,
        )
        variables = cast_floating(variables, dtype)
        chunk = jnp.asarray(rng.integers(
            0, 255, size=(streams, t, IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.uint8
        ))
        zero = ConvLSTM.zero_state(
            model.lstm_layers, streams, LAT, LAT, HIDDEN, dtype=jnp.float32
        )
        holder = {"s": None, "states": zero}

        @jax.jit
        def run(v, u8, states):
            x = u8.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
            _, _, fs, ns = model.apply(v, x, states, method=VideoAutoencoder.stream_step)
            return fs.astype(jnp.float32), ns

        def fn():
            holder["s"], holder["states"] = run(variables, chunk, holder["states"])

        def barrier():
            np.asarray(holder["s"])

        sec = best_window(fn, barrier, n_iters=max(2, 128 // t))
        return streams * t / sec

    grid_t = (16, 64, 128)
    grid_s = (4, 16, 32)
    rec_rows, full_rows = [], []
    for streams in grid_s:
        for t in grid_t:
            cell = {}
            for backend in ("xla", "pallas"):
                cell[backend] = measure_recurrence(backend, streams, t)
            ratio = cell["xla"] / cell["pallas"]
            rec_rows.append((streams, t, cell["xla"], cell["pallas"], ratio))
            print(f"recurrence S={streams:3d} T={t:3d}: xla {cell['xla']:.2f} "
                  f"pallas {cell['pallas']:.2f} us/frame  pallas-speedup {ratio:.3f}",
                  flush=True)
    for streams in (16, 32):
        for t in (16, 64):
            cell = {}
            for backend in ("xla", "pallas"):
                cell[backend] = measure_full(backend, streams, t)
            ratio = cell["pallas"] / cell["xla"]
            full_rows.append((streams, t, cell["xla"], cell["pallas"], ratio))
            print(f"full step  S={streams:3d} T={t:3d}: xla {cell['xla']:.0f} "
                  f"pallas {cell['pallas']:.0f} f/s  pallas-speedup {ratio:.3f}",
                  flush=True)

    best_full = max(r[4] for r in full_rows)
    best_rec = max(r[4] for r in rec_rows)
    keep_default = best_full >= 1.05
    lines = [
        "# Fused-Pallas recurrence: decision record (round 5)",
        "",
        "Question (round-4 VERDICT weak #5 / directive #7): the serving path",
        "carries a 630-LoC custom-VJP Pallas kernel for what BENCH_r04 showed",
        "as a ~1% end-to-end win.  Is there a regime where VMEM-resident",
        "(h, c) pays meaningfully, or should XLA scan be the default?",
        "",
        "## Recurrence-only (what the kernel accelerates): us per stream-frame",
        "",
        "| streams | T | xla scan | fused pallas | pallas speedup |",
        "|---|---|---|---|---|",
    ]
    for s, t, x, p, r in rec_rows:
        lines.append(f"| {s} | {t} | {x:.2f} | {p:.2f} | {r:.3f}x |")
    lines += [
        "",
        "## Full scoring step (what serving runs): frames/s",
        "",
        "| streams | T | xla scan | fused pallas | pallas speedup |",
        "|---|---|---|---|---|",
    ]
    for s, t, x, p, r in full_rows:
        lines.append(f"| {s} | {t} | {x:.0f} | {p:.0f} | {r:.3f}x |")
    lines += [
        "",
        f"Best pallas speedup observed: recurrence-only {best_rec:.3f}x, "
        f"full step {best_full:.3f}x.",
        "",
        "## Decision",
        "",
    ]
    if keep_default:
        lines += [
            f"The kernel clears the 5% bar on the full serving step "
            f"({best_full:.3f}x at its best cell), so `preferred_backend` "
            "keeps selecting it on TPU for supported shapes.",
        ]
    else:
        lines += [
            f"The kernel does NOT clear the 5% bar on any full-step cell "
            f"(best {best_full:.3f}x): the serving path is encoder-dominated, "
            "and the recurrence it accelerates is a small slice of the step. "
            "`preferred_backend` now returns 'xla' for SERVING-sized calls; "
            "the kernel remains shipped, tested (tests/test_pallas_convlstm.py "
            "equivalence + VJP), and selectable via `backend='pallas'` — an "
            "engineering record, not a default.",
        ]
    lines += [
        "",
        "Reproduce: `python tools/pallas_decision.py` (real TPU).",
        "",
    ]
    RECORD.parent.mkdir(parents=True, exist_ok=True)
    RECORD.write_text("\n".join(lines))
    (RECORD.parent / "pallas_decision.json").write_text(json.dumps({
        "recurrence_us_per_frame": [
            {"streams": s, "t": t, "xla": round(x, 2), "pallas": round(p, 2)}
            for s, t, x, p, _ in rec_rows],
        "full_step_fps": [
            {"streams": s, "t": t, "xla": round(x, 1), "pallas": round(p, 1)}
            for s, t, x, p, _ in full_rows],
        "best_full_speedup": round(best_full, 3),
        "keep_pallas_default": keep_default,
    }, indent=2) + "\n")
    print(f"wrote {RECORD}")


if __name__ == "__main__":
    main()
