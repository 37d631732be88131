"""Fused ConvLSTM recurrence as a Pallas TPU kernel.

The ConvLSTM cell is the hot inner loop of the video model: the reference
executes it 2 layers x T timesteps per forward pass as separate conv +
6 elementwise ops (reference video_autoencoder.py:67-83, 153-167).  The
input-to-gates convolution is batch-parallel over all frames and is
precomputed outside (see ConvLSTMLayer); what remains sequential is

    gates_t = gates_x[t] + conv(h_{t-1}, Wh)
    c_t = sigmoid(f) * c_{t-1} + sigmoid(i) * tanh(g)
    h_t = sigmoid(o) * tanh(c_t)

This kernel runs that whole recurrence in one pallas_call with a (B, T)
grid: (h, c) live in VMEM scratch that persists across the sequential T
grid steps, the 3x3 hidden convolution is expressed as 9 shifted
[H*W, C] x [C, 4C] MXU matmuls over a zero-padded h buffer, and the gate
math fuses in-register.  Per timestep the only HBM traffic is streaming
one gates_x block in and one h block out — h and c never round-trip.

Alignment requirements (else callers fall back to the XLA scan path):
    C % 128 == 0 (lane dim), H*W % 8 == 0 (sublane dim).
At the default config (H=W=16, C=128) each matmul is (256x128)@(128x512).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_supported(height: int, width: int, channels: int) -> bool:
    """Shape gate for the fused kernel's tiling constraints."""
    return channels % 128 == 0 and (height * width) % 8 == 0


def _recurrence_kernel(
    gates_x_ref,  # [1, 1, H*W, 4C] block for (b, t)
    w_h_ref,  # [9*C, 4C] flattened hidden kernel (tap-major)
    h0_ref,  # [1, H*W, C] block for b
    c0_ref,  # [1, H*W, C] block for b
    out_ref,  # [1, 1, H*W, C] block for (b, t)
    hfin_ref,  # [1, H*W, C] block for b
    cfin_ref,  # [1, H*W, C] block for b
    h_pad,  # VMEM scratch [H+2, W+2, C] zero-padded hidden state
    c_state,  # VMEM scratch [H*W, C]
    *,
    height: int,
    width: int,
    channels: int,
):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    hw = height * width

    @pl.when(t == 0)
    def _init():
        # zero borders once; interior overwritten every step
        h_pad[...] = jnp.zeros_like(h_pad)
        h_pad[1 : height + 1, 1 : width + 1, :] = (
            h0_ref[0].reshape(height, width, channels).astype(h_pad.dtype)
        )
        c_state[...] = c0_ref[0].astype(jnp.float32)

    # hidden-state contribution: 9 shifted taps, each an MXU matmul
    acc = gates_x_ref[0, 0].astype(jnp.float32)
    for tap in range(9):
        dy, dx = tap // 3, tap % 3
        shifted = h_pad[dy : dy + height, dx : dx + width, :].reshape(hw, channels)
        acc += jnp.dot(
            shifted,
            w_h_ref[tap * channels : (tap + 1) * channels, :],
            preferred_element_type=jnp.float32,
        )

    i = jax.nn.sigmoid(acc[:, :channels])
    f = jax.nn.sigmoid(acc[:, channels : 2 * channels])
    g = jnp.tanh(acc[:, 2 * channels : 3 * channels])
    o = jax.nn.sigmoid(acc[:, 3 * channels :])

    c_next = f * c_state[...] + i * g
    h_next = o * jnp.tanh(c_next)

    c_state[...] = c_next
    h_pad[1 : height + 1, 1 : width + 1, :] = h_next.reshape(
        height, width, channels
    ).astype(h_pad.dtype)
    out_ref[0, 0] = h_next.astype(out_ref.dtype)

    @pl.when(t == n_t - 1)
    def _finalize():
        hfin_ref[0] = h_next.astype(hfin_ref.dtype)
        cfin_ref[0] = c_next.astype(cfin_ref.dtype)


def convlstm_recurrence_pallas(
    gates_x: jnp.ndarray,  # [B, T, H, W, 4C]
    w_h: jnp.ndarray,  # [3, 3, C, 4C]
    h0: jnp.ndarray,  # [B, H, W, C]
    c0: jnp.ndarray,  # [B, H, W, C]
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Run the full ConvLSTM recurrence on TPU; returns (h_seq, (h_T, c_T)).

    Numerically equivalent to scanning `convlstm_step` over T (validated
    against the XLA path in tests/test_pallas_convlstm.py).
    """
    b, t, height, width, four_c = gates_x.shape
    channels = four_c // 4
    if not pallas_supported(height, width, channels):
        raise ValueError(
            f"fused ConvLSTM kernel needs C%128==0 and (H*W)%8==0, got "
            f"H={height} W={width} C={channels}; use the XLA backend"
        )
    hw = height * width

    gx = gates_x.reshape(b, t, hw, four_c)
    # tap-major flatten: w_flat[tap*C:(tap+1)*C] == w_h[tap//3, tap%3]
    w_flat = w_h.reshape(9 * channels, four_c)
    h0f = h0.reshape(b, hw, channels)
    c0f = c0.reshape(b, hw, channels)

    kernel = functools.partial(
        _recurrence_kernel, height=height, width=width, channels=channels
    )

    flops_per_step = 2 * hw * channels * four_c * 9 + 10 * hw * four_c
    out, hfin, cfin = pl.pallas_call(
        kernel,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(
                (1, 1, hw, four_c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (9 * channels, four_c), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, hw, channels), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, channels), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, hw, channels), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, hw, channels), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, channels), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, hw, channels), gates_x.dtype),
            jax.ShapeDtypeStruct((b, hw, channels), gates_x.dtype),
            jax.ShapeDtypeStruct((b, hw, channels), gates_x.dtype),
        ],
        scratch_shapes=[
            # hidden state in the compute dtype (bf16 taps feed the MXU
            # directly); cell state always f32 — it accumulates across the
            # whole sequence and drives the gate nonlinearities
            pltpu.VMEM((height + 2, width + 2, channels), gates_x.dtype),
            pltpu.VMEM((hw, channels), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * t * flops_per_step,
            bytes_accessed=b * t * (hw * four_c + hw * channels) * 4 + w_flat.size * 4,
            transcendentals=b * t * hw * four_c,
        ),
    )(gx, w_flat, h0f, c0f)

    h_seq = out.reshape(b, t, height, width, channels)
    return h_seq, (
        hfin.reshape(b, height, width, channels),
        cfin.reshape(b, height, width, channels),
    )
