"""Per-stage profile of the video scoring pipeline on the real TPU.

Answers VERDICT r2 item 3: where do the ~14 ms of the serving step go,
and is the first-encoder-block cost reachable by a better kernel or
pinned to XLA's emitter / HBM bandwidth?

Method: cumulative-prefix timing.  Build jitted programs computing the
pipeline up to stage k (normalize; +enc block 1..4; +ConvLSTM; +decoder;
+error reduction), time each at the bench workload (16 streams x 16
frames, 256x256, bf16), and report per-stage increments.  Prefix timing
keeps XLA free to fuse inside each prefix exactly as it does in the full
program, so the increment attributes cost the way the real pipeline pays
it.  Each stage also gets two analytic floors:

- BW floor: (bytes in + bytes out of the stage's major tensors) / 819
  GB/s (v5e HBM) — what a perfectly fused memory-bound kernel would pay.
- MXU floor: stage matmul FLOPs / 197 TF bf16 peak.

Stage encoder-block math is re-implemented here with the same lax ops the
Flax modules lower to (conv_general_dilated + BN affine + leaky_relu +
reduce_window), reading the trained variables, so XLA emits the same
code it does in production; ConvLSTM/decoder stages run the real module
methods.

Usage:  python tools/profile_blocks.py [--fused-input]
Output: a markdown table (pasted into COMPONENTS.md) + JSON lines.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819e9  # v5e
PEAK_BF16 = 197e12


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vad_tpu.models.video_autoencoder import ConvLSTM, VideoAutoencoder
    from vad_tpu.utils.precision import cast_floating

    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    S, T, H = args.streams, args.chunk, args.size
    F = S * T
    dtype = jnp.bfloat16

    model = VideoAutoencoder(backend="pallas")
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, H, H, 3)), train=False)
    variables = cast_floating(variables, dtype)
    params = variables["params"]
    stats = variables["batch_stats"]

    def enc_block(x, i):
        """Conv3x3 + inference BN + leaky_relu + maxpool, same lowering as
        the Flax encoder block (models/video_autoencoder.py:254-263)."""
        k = params["encoder"][f"Conv_{i}"]["kernel"]
        b = params["encoder"][f"Conv_{i}"]["bias"]
        x = jax.lax.conv_general_dilated(
            x, k.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(dtype)
        bn = params["encoder"][f"BatchNorm_{i}"]
        st = stats["encoder"][f"BatchNorm_{i}"]
        inv = jax.lax.rsqrt(st["var"].astype(jnp.float32) + 1e-5)
        scale = (bn["scale"].astype(jnp.float32) * inv).astype(dtype)
        shift = (
            bn["bias"].astype(jnp.float32)
            - st["mean"].astype(jnp.float32) * bn["scale"].astype(jnp.float32) * inv
        ).astype(dtype)
        x = x * scale + shift
        x = jax.nn.leaky_relu(x, 0.2)
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    def normalize(u8):
        return u8.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)

    lat = H // 16
    states = ConvLSTM.zero_state(2, S, lat, lat, 128, dtype=jnp.float32)

    def conv_lstm(z, st):
        z = z.reshape(S, T, *z.shape[1:])
        out, _ = model.apply(
            variables, z, initial_states=st, return_state=True,
            method=lambda m, z, initial_states, return_state: m.convlstm(
                z, initial_states=initial_states, return_state=return_state
            ),
        )
        return out

    def decode(z):
        return model.apply(
            variables, z, False, method=lambda m, z, train: m.decoder(z, train)
        )

    # cumulative prefixes; each returns a REAL output tensor so XLA can't
    # dead-code the stage, and the fetch at the end is the barrier
    def p0(u8, st):
        return normalize(u8)

    def p1(u8, st):
        return enc_block(normalize(u8), 0)

    def p2(u8, st):
        return enc_block(enc_block(normalize(u8), 0), 1)

    def p3(u8, st):
        x = normalize(u8)
        for i in range(3):
            x = enc_block(x, i)
        return x

    def p4(u8, st):
        x = normalize(u8)
        for i in range(4):
            x = enc_block(x, i)
        return x

    def p5(u8, st):
        x = normalize(u8)
        for i in range(4):
            x = enc_block(x, i)
        return conv_lstm(x, st)

    def p6(u8, st):
        x = normalize(u8)
        for i in range(4):
            x = enc_block(x, i)
        return decode(conv_lstm(x, st))

    def p7(u8, st):
        x = normalize(u8)
        y = x
        for i in range(4):
            y = enc_block(y, i)
        recon = decode(conv_lstm(y, st)).reshape(S, T, H, H, 3)
        err = jnp.mean(
            jnp.square(x.reshape(S, T, H, H, 3) - recon), axis=-1
        )
        return jnp.mean(err, axis=(2, 3)).astype(jnp.float32)

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, size=(F, H, H, 3), dtype=np.uint8))

    def bench(fn, n=20, reps=6):
        f = jax.jit(fn)
        out = f(u8, states)
        jax.block_until_ready(out)  # compile barrier; no host transfer —
        # early prefixes return ~100 MB tensors and pulling them over the
        # device tunnel would be charged to the stage being measured
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            for _ in range(n):
                out = f(u8, states)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / n)
        return best * 1e3  # ms per chunk step

    names = [
        "u8->bf16 normalize",
        "enc block1 (3->32, 256^2)",
        "enc block2 (32->64, 128^2)",
        "enc block3 (64->128, 64^2)",
        "enc block4 (128->128, 32^2)",
        "ConvLSTM (2 layers, 16^2)",
        "decoder (4x ConvT)",
        "error map + frame scores",
    ]
    fs = [p0, p1, p2, p3, p4, p5, p6, p7]

    # analytic floors per stage: (bytes_in + bytes_out, matmul flops)
    px = H * H
    bw = [
        (F * px * 3 * (1 + 2), 0),                                   # u8 in, bf16 out
        (F * px * 3 * 2 + F * (px // 4) * 32 * 2, F * px * 3 * 9 * 32 * 2),
        (F * (px // 4) * 32 * 2 + F * (px // 16) * 64 * 2, F * (px // 4) * 32 * 9 * 64 * 2),
        (F * (px // 16) * 64 * 2 + F * (px // 64) * 128 * 2, F * (px // 16) * 64 * 9 * 128 * 2),
        (F * (px // 64) * 128 * 2 + F * (px // 256) * 128 * 2, F * (px // 64) * 128 * 9 * 128 * 2),
        (2 * F * (px // 256) * 128 * 2 * 2, 2 * 2 * F * (px // 256) * 128 * 9 * 512 * 2),
        (F * (px // 256) * 128 * 2 + F * px * 3 * 2,
         F * ((px // 64) * 128 * 4 * 128 + (px // 16) * 128 * 4 * 64
              + (px // 4) * 64 * 4 * 32 + px * 32 * 4 * 3) * 2),
        (F * px * 3 * 2 * 2, 0),
    ]

    cum = [bench(f) for f in fs]
    rows = []
    prev = 0.0
    for name, c, (bytes_moved, flops) in zip(names, cum, bw):
        inc = c - prev
        prev = c
        bw_floor = bytes_moved / HBM_GBPS * 1e3
        mxu_floor = flops / PEAK_BF16 * 1e3
        rows.append((name, inc, c, bw_floor, mxu_floor))
        print(json.dumps({
            "stage": name, "inc_ms": round(inc, 2), "cum_ms": round(c, 2),
            "bw_floor_ms": round(bw_floor, 2), "mxu_floor_ms": round(mxu_floor, 3),
        }), flush=True)

    print("\n| stage | inc ms | cum ms | BW floor ms | MXU floor ms |")
    print("|---|---|---|---|---|")
    for name, inc, c, bwf, mxf in rows:
        print(f"| {name} | {inc:.2f} | {c:.2f} | {bwf:.2f} | {mxf:.3f} |")
    total = cum[-1]
    print(f"\ntotal {total:.2f} ms/chunk-step -> {F / total * 1e3:.0f} frames/s")


if __name__ == "__main__":
    main()
