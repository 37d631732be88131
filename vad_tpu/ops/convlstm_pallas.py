"""Fused ConvLSTM recurrence as Pallas TPU kernels (forward + backward).

The ConvLSTM cell is the hot inner loop of the video model: the reference
executes it 2 layers x T timesteps per forward pass as separate conv +
6 elementwise ops (reference video_autoencoder.py:67-83, 153-167).  The
input-to-gates convolution is batch-parallel over all frames and is
precomputed outside (see ConvLSTMLayer); what remains sequential is

    gates_t = gates_x[t] + conv(h_{t-1}, Wh)
    c_t = sigmoid(f) * c_{t-1} + sigmoid(i) * tanh(g)
    h_t = sigmoid(o) * tanh(c_t)

Forward kernel: one pallas_call with a (B, T) grid — (h, c) live in VMEM
scratch that persists across the sequential T steps, the 3x3 hidden
convolution is 9 shifted [H*W, C] x [C, 4C] MXU matmuls over a
zero-padded h buffer, and the gate math fuses in-register.  Per timestep
the only HBM traffic is one gates_x block in and one h block out.

Backward kernel (jax.custom_vjp): the same grid traversed in reverse
(t = T-1 .. 0), carrying (dh, dc) in VMEM.  Gates are recomputed from the
stored h sequence (cheaper than storing pre-activations), cell states are
stored by the training-mode forward.  Per step:

    dgates_x[t]  elementwise from the recomputed gate activations;
    dh_{t-1}     "full correlation" — 9 shifted [H*W, 4C] x [4C, C]
                 matmuls over zero-padded dgates (Wh^T passed in
                 pre-transposed);
    dWh          9 [C, H*W] x [H*W, 4C] contractions accumulated in a
                 VMEM-resident output block across the whole grid.

Alignment requirements (else callers fall back to the XLA scan path):
    C % 128 == 0 (lane dim), H*W % 8 == 0 (sublane dim).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_supported(height: int, width: int, channels: int) -> bool:
    """Shape gate for the fused kernels' tiling constraints."""
    return channels % 128 == 0 and (height * width) % 8 == 0


def preferred_backend(height: int, width: int, channels: int,
                      context: str = "serving") -> str:
    """Pick the recurrence backend for the given latent shape and context.

    ``context='serving'`` returns 'xla': the round-5 decision grid
    (results/experiments/pallas_decision.md, tools/pallas_decision.py)
    measured the fused kernel's best FULL-scoring-step win at 1.017x
    across (streams, T) in {4..32}x{16..128} — under the 5% bar set for
    keeping a 630-LoC custom kernel on the default path.  The serving
    step is encoder-dominated; the recurrence the kernel accelerates
    (up to 1.31x in isolation at S=32, T=16) is too small a slice.
    The kernel stays shipped, tested (tests/test_pallas_convlstm.py),
    and selectable via ``backend='pallas'``.

    ``context='training'`` returns 'pallas' on TPU where the shape fits:
    training steps measured ~5% faster than the XLA scan end to end
    (217 vs 229 ms at B=4, T=16, 256^2 — round 3) and compile several
    times faster, with identical loss trajectories (custom VJP).

    On CPU/GPU (no Mosaic) the answer is always 'xla'.
    """
    import jax

    if (context == "training" and jax.default_backend() == "tpu"
            and pallas_supported(height, width, channels)):
        return "pallas"
    return "xla"


# ------------------------------------------------- batched serving forward
#
# Inference-only forward used on the scoring path.  Differences from the
# training forward below:
#   - several batch elements are folded into the matmul M dimension
#     (grid (B/B_tile, T), state scratch [B_tile*HW, C]), so the MXU sees
#     [M, C] x [C, 4C] with M in the thousands instead of 256;
#   - the 3x3 hidden conv reads its 9 taps by sublane-rolling the FLAT
#     state matrix (one pixel per row) and masking rows whose tap falls
#     outside the frame — no zero-padded 3D buffer, no strided-window
#     reshapes, so the layout is native for bf16 (16, 128) tiles as well.
# Rows rolled across a batch boundary are exactly the rows whose tap row
# index leaves [0, H), so the frame mask also handles batch isolation.


def _serving_kernel(
    gates_x_ref,  # [B_tile, 1, HW, 4C] block for (bi, t)
    w_h_ref,  # [9*C, 4C] tap-major hidden kernel
    h0_ref,  # [B_tile, HW, C]
    c0_ref,  # [B_tile, HW, C]
    out_ref,  # [B_tile, 1, HW, C]
    hfin_ref,  # [B_tile, HW, C]
    cfin_ref,  # [B_tile, HW, C]
    h_state,  # VMEM scratch [B_tile*HW, C] f32 (Mosaic rotates are 32-bit)
    c_state,  # VMEM scratch [B_tile*HW, C] f32
    *,
    b_tile: int,
    height: int,
    width: int,
    channels: int,
):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    hw = height * width
    m = b_tile * hw

    dtype = out_ref.dtype

    @pl.when(t == 0)
    def _init():
        h_state[...] = h0_ref[...].reshape(m, channels).astype(jnp.float32)
        c_state[...] = c0_ref[...].reshape(m, channels).astype(jnp.float32)

    acc = gates_x_ref[:, 0].reshape(m, 4 * channels).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    y = (row % hw) // width
    x = row % width
    h_cur = h_state[...]
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            shift = (dy - 1) * width + (dx - 1)
            # circular roll so rolled[p] = h[p + shift]; out-of-frame rows
            # (including wrap-around) are zeroed by the mask below
            shifted = pltpu.roll(h_cur, (-shift) % m, axis=0) if shift else h_cur
            valid = (
                (y + dy - 1 >= 0)
                & (y + dy - 1 < height)
                & (x + dx - 1 >= 0)
                & (x + dx - 1 < width)
            )
            shifted = jnp.where(valid, shifted, jnp.zeros_like(shifted))
            acc += jnp.dot(
                shifted.astype(dtype),
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
    h_state[...] = h_next.astype(h_state.dtype)
    out_ref[:, 0] = h_next.reshape(b_tile, hw, channels).astype(out_ref.dtype)

    @pl.when(t == n_t - 1)
    def _finalize():
        hfin_ref[...] = h_next.reshape(b_tile, hw, channels).astype(hfin_ref.dtype)
        cfin_ref[...] = c_next.reshape(b_tile, hw, channels).astype(cfin_ref.dtype)


def _pick_b_tile(b: int, hw: int, itemsize: int) -> int:
    """Largest divisor of b keeping M = b_tile*HW near ~1024 rows (bf16) /
    ~512 (f32): big enough to stream the MXU, small enough that the VMEM
    working set (double-buffered gates block + f32 states + f32
    accumulator) fits the 16MB scoped limit."""
    cap = max(1, (1024 if itemsize <= 2 else 512) // hw)
    tile = 1
    for cand in range(1, b + 1):
        if b % cand == 0 and cand <= cap:
            tile = cand
    return tile


def _run_serving_forward(gates_x, w_h, h0, c0):
    b, t, height, width, four_c = gates_x.shape
    channels = four_c // 4
    if not pallas_supported(height, width, channels):
        raise ValueError(
            f"fused ConvLSTM kernel needs C%128==0 and (H*W)%8==0, got "
            f"H={height} W={width} C={channels}; use the XLA backend"
        )
    hw = height * width
    b_tile = _pick_b_tile(b, hw, gates_x.dtype.itemsize)

    gx = gates_x.reshape(b, t, hw, four_c)
    w_flat = w_h.reshape(9 * channels, four_c).astype(gates_x.dtype)
    h0f = h0.reshape(b, hw, channels)
    c0f = c0.reshape(b, hw, channels)

    kernel = functools.partial(
        _serving_kernel,
        b_tile=b_tile,
        height=height,
        width=width,
        channels=channels,
    )
    flops_per_step = 2 * b_tile * hw * channels * four_c * 9 + 10 * b_tile * hw * four_c

    bt_block = lambda feat: pl.BlockSpec(  # noqa: E731
        (b_tile, 1, hw, feat), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    b_block = lambda feat: pl.BlockSpec(  # noqa: E731
        (b_tile, hw, feat), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )

    h_seq, hfin, cfin = pl.pallas_call(
        kernel,
        grid=(b // b_tile, t),
        in_specs=[
            bt_block(four_c),
            pl.BlockSpec(
                (9 * channels, four_c), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            b_block(channels),
            b_block(channels),
        ],
        out_specs=[bt_block(channels), b_block(channels), b_block(channels)],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, hw, channels), gates_x.dtype),
            # final (h, c) stay f32 so streaming callers can carry cell
            # state across chunks without bf16 truncation at boundaries
            jax.ShapeDtypeStruct((b, hw, channels), jnp.float32),
            jax.ShapeDtypeStruct((b, hw, channels), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_tile * hw, channels), jnp.float32),
            pltpu.VMEM((b_tile * hw, channels), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * t * flops_per_step // b_tile,
            bytes_accessed=b * t * (hw * four_c + hw * channels) * gates_x.dtype.itemsize
            + w_flat.size * w_flat.dtype.itemsize,
            transcendentals=b * t * hw * four_c,
        ),
    )(gx, w_flat, h0f, c0f)

    shape5 = (b, t, height, width, channels)
    shape4 = (b, height, width, channels)
    return h_seq.reshape(shape5), hfin.reshape(shape4), cfin.reshape(shape4)


# ---------------------------------------------------------------- forward


def _forward_kernel(
    gates_x_ref,  # [1, 1, H*W, 4C] block for (b, t)
    w_h_ref,  # [9*C, 4C] flattened hidden kernel (tap-major)
    h0_ref,  # [1, H*W, C] block for b
    c0_ref,  # [1, H*W, C] block for b
    out_ref,  # [1, 1, H*W, C] block for (b, t)
    cseq_ref,  # [1, 1, H*W, C] block for (b, t) or None (inference)
    hfin_ref,  # [1, H*W, C] block for b
    cfin_ref,  # [1, H*W, C] block for b
    h_pad,  # VMEM scratch [H+2, W+2, C]
    c_state,  # VMEM scratch [H*W, C] f32
    *,
    height: int,
    width: int,
    channels: int,
    with_cell_seq: bool,
):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    hw = height * width

    @pl.when(t == 0)
    def _init():
        h_pad[...] = jnp.zeros_like(h_pad)
        h_pad[1 : height + 1, 1 : width + 1, :] = (
            h0_ref[0].reshape(height, width, channels).astype(h_pad.dtype)
        )
        c_state[...] = c0_ref[0].astype(jnp.float32)

    # all 9 taps concatenated along lanes -> ONE [H*W, 9C] x [9C, 4C]
    # MXU matmul (measured ~6% over 9 narrow matmuls)
    h_cat = jnp.concatenate(
        [
            h_pad[dy : dy + height, dx : dx + width, :].reshape(hw, channels)
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    )
    acc = gates_x_ref[0, 0].astype(jnp.float32) + jnp.dot(
        h_cat, w_h_ref[...], preferred_element_type=jnp.float32
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
    if with_cell_seq:
        cseq_ref[0, 0] = c_next.astype(cseq_ref.dtype)

    @pl.when(t == n_t - 1)
    def _finalize():
        hfin_ref[0] = h_next.astype(hfin_ref.dtype)
        cfin_ref[0] = c_next.astype(cfin_ref.dtype)


def _run_forward(gates_x, w_h, h0, c0, with_cell_seq: bool):
    b, t, height, width, four_c = gates_x.shape
    channels = four_c // 4
    if not pallas_supported(height, width, channels):
        raise ValueError(
            f"fused ConvLSTM kernel needs C%128==0 and (H*W)%8==0, got "
            f"H={height} W={width} C={channels}; use the XLA backend"
        )
    hw = height * width

    gx = gates_x.reshape(b, t, hw, four_c)
    w_flat = w_h.reshape(9 * channels, four_c)
    h0f = h0.reshape(b, hw, channels)
    c0f = c0.reshape(b, hw, channels)

    kernel = functools.partial(
        _forward_kernel,
        height=height,
        width=width,
        channels=channels,
        with_cell_seq=with_cell_seq,
    )
    flops_per_step = 2 * hw * channels * four_c * 9 + 10 * hw * four_c

    bt_block = lambda feat: pl.BlockSpec(  # noqa: E731
        (1, 1, hw, feat), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    b_block = lambda feat: pl.BlockSpec(  # noqa: E731
        (1, hw, feat), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )

    out_shapes = [
        jax.ShapeDtypeStruct((b, t, hw, channels), gates_x.dtype),  # h_seq
        jax.ShapeDtypeStruct(
            (b, t, hw, channels) if with_cell_seq else (1, 1, hw, channels),
            gates_x.dtype,
        ),  # c_seq (dummy-sized when unused)
        jax.ShapeDtypeStruct((b, hw, channels), gates_x.dtype),  # h_final
        jax.ShapeDtypeStruct((b, hw, channels), gates_x.dtype),  # c_final
    ]
    cseq_spec = (
        bt_block(channels)
        if with_cell_seq
        else pl.BlockSpec((1, 1, hw, channels), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    )

    h_seq, c_seq, hfin, cfin = pl.pallas_call(
        kernel,
        grid=(b, t),
        in_specs=[
            bt_block(four_c),
            pl.BlockSpec((9 * channels, four_c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            b_block(channels),
            b_block(channels),
        ],
        out_specs=[bt_block(channels), cseq_spec, b_block(channels), b_block(channels)],
        out_shape=out_shapes,
        scratch_shapes=[
            # hidden state in the compute dtype; cell state always f32 (it
            # integrates across the whole sequence)
            pltpu.VMEM((height + 2, width + 2, channels), gates_x.dtype),
            pltpu.VMEM((hw, channels), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * t * flops_per_step,
            bytes_accessed=b * t * (hw * four_c + hw * channels) * 4 + w_flat.size * 4,
            transcendentals=b * t * hw * four_c,
        ),
    )(gx, w_flat, h0f, c0f)

    shape5 = (b, t, height, width, channels)
    shape4 = (b, height, width, channels)
    return (
        h_seq.reshape(shape5),
        c_seq.reshape(shape5) if with_cell_seq else None,
        hfin.reshape(shape4),
        cfin.reshape(shape4),
    )


# ---------------------------------------------------------------- backward


def _backward_kernel(
    dh_seq_ref,  # [1, 1, H*W, C] block for (b, t)
    gates_x_ref,  # [1, 1, H*W, 4C] block for (b, t)
    h_prev_ref,  # [1, 1, H*W, C] h_seq[t-1] (clamped; h0 used at t==0)
    c_prev_ref,  # [1, 1, H*W, C] c_seq[t-1] (clamped; c0 used at t==0)
    c_t_ref,  # [1, 1, H*W, C] c_seq[t]
    h0_ref,  # [1, H*W, C]
    c0_ref,  # [1, H*W, C]
    dhf_ref,  # [1, H*W, C] cotangent of the final hidden state
    dcf_ref,  # [1, H*W, C] cotangent of the final cell state
    w_h_ref,  # [9*C, 4C]
    w_hT_ref,  # [9*4C, C] per-tap transposed kernel
    dgates_x_ref,  # out [1, 1, H*W, 4C] block for (b, t)
    dw_ref,  # out [9*C, 4C] accumulated over the whole grid
    dh0_ref,  # out [1, H*W, C] per b
    dc0_ref,  # out [1, H*W, C] per b
    dh_carry,  # scratch [H*W, C] f32
    dc_carry,  # scratch [H*W, C] f32
    h_pad,  # scratch [H+2, W+2, C] f32 (zero-padded h_{t-1})
    g_pad,  # scratch [H+2, W+2, 4C] f32 (zero-padded dgates)
    *,
    height: int,
    width: int,
    channels: int,
    t_total: int,
):
    b_i = pl.program_id(0)
    rt = pl.program_id(1)
    t = t_total - 1 - rt
    hw = height * width
    first_step = rt == 0  # t == T-1
    last_step = rt == t_total - 1  # t == 0

    @pl.when(jnp.logical_and(b_i == 0, first_step))
    def _zero_dw():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    @pl.when(first_step)
    def _init_carries():
        dh_carry[...] = dhf_ref[0].astype(jnp.float32)
        dc_carry[...] = dcf_ref[0].astype(jnp.float32)
        h_pad[...] = jnp.zeros_like(h_pad)
        g_pad[...] = jnp.zeros_like(g_pad)

    # previous-step states (h0/c0 at t == 0)
    h_prev = jnp.where(last_step, h0_ref[0], h_prev_ref[0, 0]).astype(jnp.float32)
    c_prev = jnp.where(last_step, c0_ref[0], c_prev_ref[0, 0]).astype(jnp.float32)

    # recompute the gate pre-activations: gates_x[t] + conv(h_prev, Wh)
    h_pad[1 : height + 1, 1 : width + 1, :] = h_prev.reshape(height, width, channels)
    h_cat = jnp.concatenate(
        [
            h_pad[dy : dy + height, dx : dx + width, :].reshape(hw, channels)
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    )  # [H*W, 9C]
    acc = gates_x_ref[0, 0].astype(jnp.float32) + jnp.dot(
        h_cat, w_h_ref[...], preferred_element_type=jnp.float32
    )

    i = jax.nn.sigmoid(acc[:, :channels])
    f = jax.nn.sigmoid(acc[:, channels : 2 * channels])
    g = jnp.tanh(acc[:, 2 * channels : 3 * channels])
    o = jax.nn.sigmoid(acc[:, 3 * channels :])
    tanh_ct = jnp.tanh(c_t_ref[0, 0].astype(jnp.float32))

    dh_total = dh_seq_ref[0, 0].astype(jnp.float32) + dh_carry[...]
    dc_total = dc_carry[...] + dh_total * o * (1.0 - tanh_ct * tanh_ct)

    di = dc_total * g * i * (1.0 - i)
    df = dc_total * c_prev * f * (1.0 - f)
    dg = dc_total * i * (1.0 - g * g)
    do = dh_total * tanh_ct * o * (1.0 - o)
    dgates = jnp.concatenate([di, df, dg, do], axis=-1)

    dgates_x_ref[0, 0] = dgates.astype(dgates_x_ref.dtype)

    # dWh: all taps at once — h_cat^T @ dgates contracts the H*W dim into
    # the full [9C, 4C] update in a single MXU contraction
    dw_ref[...] += jax.lax.dot_general(
        h_cat,
        dgates,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw_ref.dtype)

    # dh_{t-1}: full correlation of dgates with Wh (taps reversed), again
    # as one [H*W, 9*4C] x [9*4C, C] matmul
    g_pad[1 : height + 1, 1 : width + 1, :] = dgates.reshape(
        height, width, 4 * channels
    )
    four_c = 4 * channels
    g_cat = jnp.concatenate(
        [
            g_pad[2 - dy : 2 - dy + height, 2 - dx : 2 - dx + width, :].reshape(hw, four_c)
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    )
    dh_prev = jnp.dot(g_cat, w_hT_ref[...], preferred_element_type=jnp.float32)

    dh_carry[...] = dh_prev
    dc_carry[...] = dc_total * f

    @pl.when(last_step)
    def _emit_initial_grads():
        dh0_ref[0] = dh_prev.astype(dh0_ref.dtype)
        dc0_ref[0] = (dc_total * f).astype(dc0_ref.dtype)


def _run_backward(gates_x, w_h, h0, c0, h_seq, c_seq, dh_seq, dhf, dcf):
    b, t, height, width, four_c = gates_x.shape
    channels = four_c // 4
    hw = height * width

    gx = gates_x.reshape(b, t, hw, four_c)
    dhs = dh_seq.reshape(b, t, hw, channels)
    hs = h_seq.reshape(b, t, hw, channels)
    cs = c_seq.reshape(b, t, hw, channels)
    w_flat = w_h.reshape(9 * channels, four_c)
    # per-tap transpose: w_hT[tap*4C:(tap+1)*4C, :] == w_h[tap].T
    w_T = jnp.transpose(w_h.reshape(9, channels, four_c), (0, 2, 1)).reshape(
        9 * four_c, channels
    )
    h0f = h0.reshape(b, hw, channels)
    c0f = c0.reshape(b, hw, channels)
    dhff = dhf.reshape(b, hw, channels)
    dcff = dcf.reshape(b, hw, channels)

    kernel = functools.partial(
        _backward_kernel, height=height, width=width, channels=channels, t_total=t
    )

    def bt(feat, offset):
        # offset 0: block (b, T-1-rt); offset -1: clamped previous step
        if offset == 0:
            index = lambda i, j: (i, t - 1 - j, 0, 0)  # noqa: E731
        else:
            index = lambda i, j: (i, jnp.maximum(t - 2 - j, 0), 0, 0)  # noqa: E731
        return pl.BlockSpec((1, 1, hw, feat), index, memory_space=pltpu.VMEM)

    b_block = lambda feat: pl.BlockSpec(  # noqa: E731
        (1, hw, feat), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda rows, cols: pl.BlockSpec(  # noqa: E731
        (rows, cols), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )

    dgates_x, dw, dh0, dc0 = pl.pallas_call(
        kernel,
        grid=(b, t),
        in_specs=[
            bt(channels, 0),  # dh_seq[t]
            bt(four_c, 0),  # gates_x[t]
            bt(channels, -1),  # h_seq[t-1]
            bt(channels, -1),  # c_seq[t-1]
            bt(channels, 0),  # c_seq[t]
            b_block(channels),  # h0
            b_block(channels),  # c0
            b_block(channels),  # dhf
            b_block(channels),  # dcf
            full(9 * channels, four_c),  # w_h
            full(9 * four_c, channels),  # w_h^T
        ],
        out_specs=[
            bt(four_c, 0),  # dgates_x[t]
            full(9 * channels, four_c),  # dw (accumulated)
            b_block(channels),  # dh0
            b_block(channels),  # dc0
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, hw, four_c), gates_x.dtype),
            jax.ShapeDtypeStruct((9 * channels, four_c), jnp.float32),
            jax.ShapeDtypeStruct((b, hw, channels), gates_x.dtype),
            jax.ShapeDtypeStruct((b, hw, channels), gates_x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((hw, channels), jnp.float32),  # dh carry
            pltpu.VMEM((hw, channels), jnp.float32),  # dc carry
            pltpu.VMEM((height + 2, width + 2, channels), jnp.float32),
            pltpu.VMEM((height + 2, width + 2, 4 * channels), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * t * (6 * hw * channels * four_c * 9),
            bytes_accessed=b * t * hw * (3 * channels + 2 * four_c) * 4,
            transcendentals=b * t * hw * (four_c + channels),
        ),
    )(dhs, gx, hs, cs, cs, h0f, c0f, dhff, dcff, w_flat, w_T)

    return (
        dgates_x.reshape(b, t, height, width, four_c),
        dw.reshape(3, 3, channels, four_c).astype(w_h.dtype),
        dh0.reshape(b, height, width, channels),
        dc0.reshape(b, height, width, channels),
    )


# ----------------------------------------------------------- public op


@jax.custom_vjp
def convlstm_recurrence_pallas(
    gates_x: jnp.ndarray,  # [B, T, H, W, 4C]
    w_h: jnp.ndarray,  # [3, 3, C, 4C]
    h0: jnp.ndarray,  # [B, H, W, C]
    c0: jnp.ndarray,  # [B, H, W, C]
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Run the full ConvLSTM recurrence on TPU; returns (h_seq, (h_T, c_T)).

    Numerically equivalent to scanning `convlstm_step` over T, forward and
    backward (validated in tests/test_pallas_convlstm.py).  The primal
    (inference/serving) call uses the batch-folded roll kernel; under
    autodiff the VJP pair below swaps in the training forward, which also
    stores the cell sequence for the backward recomputation.
    """
    h_seq, hf, cf = _run_serving_forward(gates_x, w_h, h0, c0)
    return h_seq, (hf, cf)


def _fwd(gates_x, w_h, h0, c0):
    h_seq, c_seq, hf, cf = _run_forward(gates_x, w_h, h0, c0, with_cell_seq=True)
    # final-state dtype must match the primal (f32 finals; see
    # _run_serving_forward out_shape)
    return (h_seq, (hf.astype(jnp.float32), cf.astype(jnp.float32))), (
        gates_x, w_h, h0, c0, h_seq, c_seq,
    )


def _bwd(residuals, cotangents):
    gates_x, w_h, h0, c0, h_seq, c_seq = residuals
    dh_seq, (dhf, dcf) = cotangents
    dgates_x, dw, dh0, dc0 = _run_backward(
        gates_x, w_h, h0, c0, h_seq, c_seq,
        dh_seq, dhf.astype(gates_x.dtype), dcf.astype(gates_x.dtype),
    )
    # cotangents must mirror the primal input dtypes (h0/c0 may be f32
    # while gates are bf16)
    return dgates_x, dw, dh0.astype(h0.dtype), dc0.astype(c0.dtype)


convlstm_recurrence_pallas.defvjp(_fwd, _bwd)
