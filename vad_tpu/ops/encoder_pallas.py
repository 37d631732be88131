"""Fused first encoder block as a Pallas TPU kernel.

The serving pipeline's dominant cost is NOT the ConvLSTM recurrence but
the first encoder block: XLA materializes the [F, 256, 256, 32] conv
output (1.07 GB bf16 per 256-frame chunk) before max-pooling it, and the
u8->bf16 normalization makes another full-size round trip — ~8.5 ms of
the ~14 ms scoring step at 256x256 (measured on v5e; see bench.py).
The reference runs this as three separate torch ops
(models/video_autoencoder.py:195-205: Conv2d + BatchNorm2d + LeakyReLU
inside nn.Sequential, then MaxPool2d).

This kernel fuses normalize + conv3x3 + BatchNorm + LeakyReLU + maxpool
2x2 into ONE pass over the frame with every intermediate resident in
VMEM.  HBM traffic drops from ~2.4 GB to 50 MB in + 268 MB out per
256-frame chunk.

MEASURED OUTCOME (v5e, honest negative result): the kernel runs the
block+norm in 4.2-5.4 ms per 256-frame chunk vs ~5-6 ms inside XLA's
fused pipeline — but END-TO-END THE FUSED PATH LOSES ~11-12%%
(BENCH_r02: 16,424 vs 18,472 frames/s; re-measured round 3: 16,520 vs
18,853): XLA re-lays-out the kernel's output for its conv2 emitter,
eating more than the savings.  (An earlier ad-hoc two-point timing read
"neutral, 13.7 vs 13.1 ms"; the steady-state multi-window benchmark is
the authoritative number — the docstring previously understated the
loss.)  Variant ablation shows the in-kernel assembly
(rolls/concats/masks) costs ~0; the floor is per-program overhead +
VMEM round-trips of the [1024, 1024] f32 accumulators (6 MXU calls,
2 parities x 3 row-taps); folding more frames per program overflows
the 16 MB VMEM budget.  The path is kept as a LOSING opt-in
(MultiStreamScorer(fused_input=True), bench.py config line) purely so
the regression is tracked run-over-run on future TPU generations.

Design notes (all layout choices exist to avoid the TPU's 128-lane
padding of 3-channel-minor tensors, which costs 42x in bandwidth):

- Input is the raw interleaved-RGB byte stream viewed as
  [F, H/2, 2, W*3/96, 96]: a pure reinterpretation of contiguous NHWC
  bytes (no host or device shuffle).  Two BlockSpecs over the
  even/odd-row axis make the *DMA engine* deliver the two row parities
  as separate VMEM buffers — no strided ops inside the kernel.
- The 3x3 conv is a banded matmul: for each (row-parity a, row-tap dy)
  the kernel assembles X [H/2*G, 102] (32-pixel groups + 1-pixel halo
  on each side, RGB interleaved in lanes) with two sublane rolls and a
  lane concat, then accumulates X @ W_band [102, GROUP*C1] on the MXU.
  Weight columns are laid out as (w-parity b, pooled-px p', channel c),
  so the 2x2 maxpool collapses to max of two contiguous lane halves
  (w-pool) and max of the two parity accumulators (h-pool).
- uint8 values are exactly representable in bf16, so the input affine
  (x/127.5 - 1) and inference BatchNorm fold entirely into the conv
  weights and bias: the kernel consumes raw bytes.
- Output is [F, H/2, G, 32*C1] (lane-major pooled pixels); a free
  XLA reshape turns it into NHWC [F, H/2, W/2, C1] for the next block.

Numerics match the XLA reference block to bf16 tolerance
(tests/test_encoder_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 32  # pixels per lane-group; 32 px * 3 ch = 96 lanes
HALO = 3  # one pixel of RGB halo on each side
KLANES = 2 * HALO + 3 * GROUP  # 102


def fold_first_block_params(
    kernel: np.ndarray,  # [3, 3, 3, C1] HWIO conv weights
    bias: np.ndarray,  # [C1]
    bn_mean: np.ndarray,
    bn_var: np.ndarray,
    bn_scale: np.ndarray,
    bn_bias: np.ndarray,
    *,
    eps: float = 1e-5,
    in_scale: float = 1.0 / 127.5,
    in_shift: float = -1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold input normalization + inference BatchNorm into (W_band, bias).

    conv(a*u + s) = a*conv(u) + s*sum(W); BN(y) = (y - mu)*g/sqrt(v+eps)+b
    is affine, so the whole block is one conv with rescaled weights on
    RAW uint8 values.  Returns:
        w_band [3, KLANES, GROUP*C1]: per-dy banded matrix whose row
            space is the 34-pixel interleaved window and whose column
            space is (w-parity b, pooled-px p', out-channel c);
        bias_folded [GROUP*C1] broadcast along the same column order.
    """
    kernel = np.asarray(kernel, np.float32)
    c1 = kernel.shape[-1]
    s_bn = np.asarray(bn_scale, np.float32) / np.sqrt(np.asarray(bn_var, np.float32) + eps)
    w_eff = kernel * in_scale * s_bn  # [3,3,3,C1]
    b_eff = (
        in_shift * kernel.sum(axis=(0, 1, 2)) + np.asarray(bias, np.float32)
        - np.asarray(bn_mean, np.float32)
    ) * s_bn + np.asarray(bn_bias, np.float32)

    w_band = np.zeros((3, KLANES, GROUP * c1), np.float32)
    for dy in range(3):
        for p in range(GROUP):  # conv pixel inside the group
            b_par, p_half = p % 2, p // 2
            col0 = b_par * (GROUP // 2) * c1 + p_half * c1
            for dx in range(3):
                s = p + dx - 1  # input pixel in [-1, GROUP]
                lane0 = (s + 1) * 3
                w_band[dy, lane0 : lane0 + 3, col0 : col0 + c1] = w_eff[dy, dx]
    bias_folded = np.broadcast_to(b_eff, (2, GROUP // 2, c1)).reshape(-1).copy()
    return w_band, bias_folded


def fold_from_variables(variables, **kwargs) -> Tuple[np.ndarray, np.ndarray]:
    """fold_first_block_params from a VideoAutoencoder variables dict."""
    p = variables["params"]["encoder"]
    if "BatchNorm_0" not in p:
        raise ValueError(
            "fused input block folds inference BatchNorm into the conv; "
            "this model was built with norm='group' — use the standard path"
        )
    b = variables["batch_stats"]["encoder"]
    return fold_first_block_params(
        np.asarray(p["Conv_0"]["kernel"], np.float32),
        np.asarray(p["Conv_0"]["bias"], np.float32),
        np.asarray(b["BatchNorm_0"]["mean"], np.float32),
        np.asarray(b["BatchNorm_0"]["var"], np.float32),
        np.asarray(p["BatchNorm_0"]["scale"], np.float32),
        np.asarray(p["BatchNorm_0"]["bias"], np.float32),
        **kwargs,
    )


def _first_block_kernel(
    xe_ref,  # [1, HH, 1, G, 96] u8 — even pixel rows
    xo_ref,  # [1, HH, 1, G, 96] u8 — odd pixel rows
    wb_ref,  # [3, KLANES, N] banded weights (N = GROUP*C1 conv outputs)
    bias_ref,  # [1, N] f32
    out_ref,  # [1, HH, G, N//2] block (pooled: 16 px * C1 lanes)
    *,
    hh: int,  # H/2 pooled rows
    g: int,  # groups per row (W*3/96)
    c1: int,
    negative_slope: float,
    pad_u: float,  # u8 value mapping to 0 after the folded input affine
):
    m = hh * g
    n = GROUP * c1  # matmul N: (b, p', c) with b in {0,1}

    # Mosaic has no direct u8->f32 cast; widen through int32
    even = xe_ref[0, :, 0].astype(jnp.int32).astype(jnp.float32).reshape(m, 96)
    odd = xo_ref[0, :, 0].astype(jnp.int32).astype(jnp.float32).reshape(m, 96)

    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    gi = rows % g  # group index within the pixel row
    first_g = gi == 0
    last_g = gi == g - 1

    # Borders pad with pad_u, the u8 value whose folded-affine image is 0
    # (the reference zero-pads the NORMALIZED input, conv "SAME"): this
    # keeps the in_shift*sum(W) bias fold exact at frame borders too.
    def band_x(src):
        """[m, 96] -> [m, KLANES]: add 3 halo lanes from the neighbouring
        group on each side (sublane roll), padded at row borders."""
        prev = pltpu.roll(src, 1, axis=0)[:, 96 - HALO :]
        nxt = pltpu.roll(src, m - 1, axis=0)[:, :HALO]
        prev = jnp.where(first_g, pad_u, prev)
        nxt = jnp.where(last_g, pad_u, nxt)
        return jnp.concatenate([prev, src, nxt], axis=1)

    def shift_h(src, dh):
        """Source plane for a neighbouring pixel-row of the same parity:
        dh = +1 -> h'+1, dh = -1 -> h'-1 (padded at frame borders)."""
        rolled = pltpu.roll(src, (-dh * g) % m, axis=0)
        if dh > 0:
            return jnp.where(rows >= m - g, pad_u, rolled)
        return jnp.where(rows < g, pad_u, rolled)

    dtype = wb_ref.dtype

    def accum(planes):
        acc = jnp.broadcast_to(bias_ref[0], (m, n)).astype(jnp.float32)
        for dy, plane in enumerate(planes):
            acc += jax.lax.dot(
                band_x(plane).astype(dtype),
                wb_ref[dy],
                preferred_element_type=jnp.float32,
            )
        return acc

    # conv rows 2h' (parity 0): pixel rows 2h'-1 (odd, h'-1), 2h', 2h'+1
    acc0 = accum([shift_h(odd, -1), even, odd])
    # conv rows 2h'+1 (parity 1): pixel rows 2h', 2h'+1, 2h'+2 (even, h'+1)
    acc1 = accum([even, odd, shift_h(even, 1)])

    def leaky(x):
        return jnp.where(x >= 0, x, negative_slope * x)

    half = n // 2
    # w-pool: lane halves are the two w-parities; h-pool: the two accs
    z0 = jnp.maximum(leaky(acc0[:, :half]), leaky(acc0[:, half:]))
    z1 = jnp.maximum(leaky(acc1[:, :half]), leaky(acc1[:, half:]))
    out_ref[0] = jnp.maximum(z0, z1).reshape(hh, g, half).astype(out_ref.dtype)


def fused_first_block(
    x_flat: jnp.ndarray,  # [F, H, W*3] u8 (flat NHWC bytes)
    w_band: jnp.ndarray,  # [3, KLANES, GROUP*C1]
    bias_folded: jnp.ndarray,  # [GROUP*C1]
    *,
    c1: int = 32,
    negative_slope: float = 0.2,
    out_dtype=jnp.bfloat16,
    in_scale: float = 1.0 / 127.5,
    in_shift: float = -1.0,
) -> jnp.ndarray:
    """normalize+conv3x3+BN+LeakyReLU+maxpool2x2 on raw u8 frames.

    in_scale/in_shift must match the values given to
    fold_first_block_params (they determine the border padding value).
    Returns [F, H/2, W/2, C1] (via a free reshape of the kernel's
    lane-major output).  H and W must be even, W*3 % 96 == 0.
    """
    f, h, w3 = x_flat.shape
    w = w3 // 3
    if w3 % 96 or h % 2:
        raise ValueError(f"fused first block needs W*3 % 96 == 0 and even H, got {x_flat.shape}")
    hh, g = h // 2, w3 // 96
    n = GROUP * c1

    x5 = x_flat.reshape(f, hh, 2, g, 96)
    wb = w_band.astype(out_dtype)
    bias2 = bias_folded.reshape(1, n).astype(jnp.float32)

    kernel = functools.partial(
        _first_block_kernel, hh=hh, g=g, c1=c1, negative_slope=negative_slope,
        pad_u=-in_shift / in_scale,
    )

    out = pl.pallas_call(
        kernel,
        grid=(f,),
        in_specs=[
            pl.BlockSpec((1, hh, 1, g, 96), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hh, 1, g, 96), lambda i: (i, 0, 1, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, KLANES, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hh, g, n // 2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((f, hh, g, n // 2), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * f * hh * g * 3 * KLANES * n,
            bytes_accessed=x_flat.size + f * hh * g * n,
            transcendentals=0,
        ),
    )(x5, x5, wb, bias2)
    # lanes are (p', c) per (h', group): -> NHWC
    return out.reshape(f, hh, g * (GROUP // 2), c1)
