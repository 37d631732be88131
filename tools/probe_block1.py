"""A/B probe of first-encoder-block formulations on the real TPU.

profile_blocks.py shows enc block1 (3->32 conv @ 256^2 + BN + leaky +
maxpool) costs 6.2 ms of the 13.1 ms scoring step against a ~0.5 ms
analytic floor — XLA's conv emitter is pathological at C_in=3.  This
probe times candidate reformulations at the bench workload (256 frames,
256x256), checking numerics against the reference block first:

  xla      — the production lowering (conv_general_dilated + affine +
             leaky + reduce_window), as profiled.
  s2d      — space-to-depth: view input as [F,128,128,12], one 12->128
             conv at 128^2 embedding all four pool sub-positions, leaky,
             then max over the 4-channel groups.  K rises 27 -> 108 and
             the tensor is never materialized at 256^2 x 32.
  s2d+pool — same conv, pool via reduce_window on the [F,128,128,4,32]
             view (lets XLA pick a different fusion).
  patches  — explicit 4x4-stride-2 patch extraction (16 strided slices)
             to [F,128,128,48], then a plain dot K=48 -> 128, leaky, max.
  pallas   — existing fused_first_block kernel (encoder_pallas.py).
  each '+b2' variant appends the real XLA block2 so handoff/relayout
  costs are charged to the producer being measured.

Usage: python tools/probe_block1.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    from vad_tpu.models.video_autoencoder import VideoAutoencoder
    from vad_tpu.ops.encoder_pallas import fold_from_variables, fused_first_block
    from vad_tpu.utils.precision import cast_floating

    F, H = 256, 256
    dtype = jnp.bfloat16

    model = VideoAutoencoder()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, H, H, 3)), train=False)
    variables = cast_floating(variables, dtype)
    params = variables["params"]
    stats = variables["batch_stats"]

    def bn_affine(i):
        bn = params["encoder"][f"BatchNorm_{i}"]
        st = stats["encoder"][f"BatchNorm_{i}"]
        inv = jax.lax.rsqrt(st["var"].astype(jnp.float32) + 1e-5)
        scale = bn["scale"].astype(jnp.float32) * inv
        shift = (
            bn["bias"].astype(jnp.float32)
            - st["mean"].astype(jnp.float32) * bn["scale"].astype(jnp.float32) * inv
        )
        return scale, shift

    def enc_block(x, i):
        k = params["encoder"][f"Conv_{i}"]["kernel"]
        b = params["encoder"][f"Conv_{i}"]["bias"]
        x = jax.lax.conv_general_dilated(
            x, k.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(dtype)
        scale, shift = bn_affine(i)
        x = x * scale.astype(dtype) + shift.astype(dtype)
        x = jax.nn.leaky_relu(x, 0.2)
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    def normalize(u8):
        return u8.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)

    # ---- folded weights for the s2d / patches formulations -------------
    # Effective conv on RAW u8: w_eff = W * in_scale * bn_scale;
    # b_eff folds in_shift, conv bias, BN (see encoder_pallas.fold_*).
    k0 = np.asarray(params["encoder"]["Conv_0"]["kernel"], np.float32)  # [3,3,3,32]
    b0 = np.asarray(params["encoder"]["Conv_0"]["bias"], np.float32)
    scale0, shift0 = bn_affine(0)
    scale0 = np.asarray(scale0, np.float32)
    shift0 = np.asarray(shift0, np.float32)
    in_scale, in_shift = 1.0 / 127.5, -1.0
    w_eff = k0 * in_scale * scale0  # [3,3,3,32] acts on raw u8
    b_eff = (in_shift * k0.sum(axis=(0, 1, 2)) + b0) * scale0 + shift0  # [32]

    C1 = 32
    w_bn0 = k0 * scale0  # [3,3,3,32] acts on the NORMALIZED input
    b_bn0 = b0 * scale0 + shift0  # [32]

    # s2d kernel [3,3,12,128]: output channel o = (2*py+px)*32 + c is the
    # conv centred at original pixel (2h'+py, 2w'+px); tap (dy,dx) of that
    # conv reads original (2h'+py+dy-1, 2w'+px+dx-1) which in s2d coords
    # is cell (R_off, C_off) channel (ry, rx, ch) with
    #   R_off = floor((py+dy-1)/2), ry = (py+dy-1) mod 2   (same for w).
    w_s2d = np.zeros((3, 3, 12, 4 * C1), np.float32)
    for py in range(2):
        for px in range(2):
            o0 = (2 * py + px) * C1
            for dy in range(3):
                for dx in range(3):
                    ry_tot, rx_tot = py + dy - 1, px + dx - 1
                    R, ry = ry_tot // 2, ry_tot % 2
                    Cc, rx = rx_tot // 2, rx_tot % 2
                    for ch in range(3):
                        w_s2d[R + 1, Cc + 1, ry * 6 + rx * 3 + ch, o0 : o0 + C1] = w_bn0[dy, dx, ch]
    b_s2d = np.tile(b_bn0, 4)  # [128]
    w_s2d_j = jnp.asarray(w_s2d, dtype)
    b_s2d_j = jnp.asarray(b_s2d, jnp.float32)

    # NOTE: the s2d conv consumes the NORMALIZED input (not raw bytes):
    # lax SAME padding inserts zeros, which must mean "normalized zero"
    # exactly as in the reference block — so only BN is folded into
    # w_s2d/b_s2d, and the input affine stays explicit (XLA fuses it).
    def s2d_view(u8):  # [F,256,256,3] u8 -> [F,128,128,12] raw bytes
        x = u8.reshape(F, H // 2, 2, H // 2, 2, 3)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(F, H // 2, H // 2, 12)

    def block1_s2d(u8):
        x = s2d_view(u8).astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
        y = jax.lax.conv_general_dilated(
            x, w_s2d_j, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32) + b_s2d_j
        y = jax.nn.leaky_relu(y, 0.2)
        return jnp.max(y.reshape(F, H // 2, H // 2, 4, C1), axis=3).astype(dtype)

    def block1_s2d_pool(u8):
        x = s2d_view(u8).astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
        y = jax.lax.conv_general_dilated(
            x, w_s2d_j, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32) + b_s2d_j
        y = jax.nn.leaky_relu(y, 0.2).reshape(F, H // 2, H // 2, 4, C1)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 1, 1, 4, 1), (1, 1, 1, 4, 1), "VALID"
        )[..., 0, :].astype(dtype)

    # patches: P[f,h',w', (ry,rx,ch)] = u8_pad[f, 2h'+ry, 2w'+rx, ch],
    # ry,rx in 0..3 with pad 1 (so original offsets -1..2). Weight
    # [48,128]: sub-position (py,px), tap (dy,dx) -> patch slot
    # (ry=py+dy, rx=px+dx).
    w_pat = np.zeros((4, 4, 3, 4 * C1), np.float32)
    for py in range(2):
        for px in range(2):
            o0 = (2 * py + px) * C1
            for dy in range(3):
                for dx in range(3):
                    w_pat[py + dy, px + dx, :, o0 : o0 + C1] = w_eff[dy, dx]
    w_pat_j = jnp.asarray(w_pat.reshape(48, 4 * C1), dtype)
    b_pat_j = jnp.asarray(np.tile(b_eff, 4), jnp.float32)  # raw-u8 fold

    def block1_patches(u8):
        # pad with the u8 value whose folded image is 0 under the affine:
        # u_pad = -in_shift/in_scale = 127.5 is not a u8; pad AFTER cast.
        xf = u8.astype(dtype)
        xp = jnp.pad(xf, ((0, 0), (1, 2), (1, 2), (0, 0)), constant_values=127.5)
        slabs = [
            xp[:, ry : ry + H : 2, rx : rx + H : 2, :]
            for ry in range(4)
            for rx in range(4)
        ]
        p = jnp.concatenate(slabs, axis=-1)  # [F,128,128,48]
        y = jnp.einsum(
            "fhwk,kn->fhwn", p, w_pat_j, preferred_element_type=jnp.float32
        ) + b_pat_j
        y = jax.nn.leaky_relu(y, 0.2)
        return jnp.max(y.reshape(F, H // 2, H // 2, 4, C1), axis=3).astype(dtype)

    wb, bf = fold_from_variables(variables)
    wb_j = jnp.asarray(wb)
    bf_j = jnp.asarray(bf)

    def block1_pallas(u8):
        return fused_first_block(u8.reshape(F, H, H * 3), wb_j, bf_j, out_dtype=dtype)

    def block1_xla(u8):
        return enc_block(normalize(u8), 0)

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, size=(F, H, H, 3), dtype=np.uint8))

    # ---- numerics ------------------------------------------------------
    ref = np.asarray(jax.jit(block1_xla)(u8), np.float32)
    for name, fn in [
        ("s2d", block1_s2d),
        ("s2d+pool", block1_s2d_pool),
        ("patches", block1_patches),
        ("pallas", block1_pallas),
    ]:
        got = np.asarray(jax.jit(fn)(u8), np.float32)
        err = np.max(np.abs(got - ref))
        rel = err / max(np.max(np.abs(ref)), 1e-6)
        print(f"numerics {name:9s} max|d|={err:.4f} rel={rel:.4f}", flush=True)

    # ---- timing --------------------------------------------------------
    def bench(fn, n=30, reps=6):
        f = jax.jit(fn)
        jax.block_until_ready(f(u8))
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = None
            for _ in range(n):
                out = f(u8)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / n)
        return best * 1e3

    variants = {
        "xla": block1_xla,
        "s2d": block1_s2d,
        "pallas": block1_pallas,
    }
    print()
    for name, fn in variants.items():
        print(f"{name:12s} block1-only {bench(fn):7.2f} ms", flush=True)
    print()
    for name, fn in variants.items():
        chained = lambda u8, fn=fn: enc_block(fn(u8), 1)
        print(f"{name:12s} block1+b2   {bench(chained):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
