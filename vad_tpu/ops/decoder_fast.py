"""Matmul reformulation of the video decoder (serving fast path).

The reference decoder (video_autoencoder.py:234-276) is four
ConvTranspose(2x2, stride 2) layers.  With kernel == stride there is no
tap overlap, so each layer is EXACTLY a per-pixel dense matmul
``C_in -> 4*C_out`` whose four output blocks are the 2x2 sub-pixels —
and because the next layer is again per-(sub)pixel, the depth-to-space
between layers is a free row-major reshape if rows are kept in
"quadtree" order (base-pixel, then sub-pixel bits per layer) instead of
raster order.  The whole decoder becomes four MXU-shaped dots with the
norm affine folded in; nothing is ever materialized at a spatial
resolution with a sub-128-lane channel minor except the final [*, 3]
output, and the raster permutation is deferred to the consumer:

- frame SCORES are order-invariant reductions, so the serving scoring
  step compares against ``quadtree_view(x)`` — the permutation fuses
  into the subtract/square/reduce and costs ~0;
- full-frame outputs (renderer, error maps) pay one explicit
  ``raster_from_quadtree`` transpose, off the hot path.

MEASURED OUTCOME (v5e, honest negative result): profile_blocks.py
put the XLA ConvTranspose decoder at 1.90 ms of the 13.08 ms scoring
step vs a 0.94 ms MXU floor, motivating this reformulation — and it
LOSES end-to-end: 11,170 vs 18,332 frames/s (-39%) at the bench
workload, with exact score parity (max|d| 1.8e-4).  Two TPU layout
effects the "free reshape" reasoning missed: (1) every inter-layer
``[R, 4*C] -> [4R, C]`` depth-to-space step changes the minor (lane)
dimension, which XLA executes as a physical relayout copy of the full
tensor — four of them; (2) the quadtree comparison tensors are
``[N, 3]``, and 3-lane-minor rows pad 42x in vector registers (the
same trap ops/encoder_pallas.py documents for the input).  The raster
NHWC pipeline keeps the 3-channel data flat in a 768-wide lane dim
and lets XLA fuse the scoring epilogue into the last ConvTranspose.
Mosaic cannot host the reformulation either: the lane-split reshape
is exactly the "unsupported shape cast" family from the encoder
kernel.  CONCLUSION: the decoder's 2x-over-floor is an XLA
conv-emitter practical floor, consistent with blocks 2-4; kept as a
tested record (tests/test_decoder_fast.py, stream_step_fast) so the
measurement survives, NOT wired into serving.

Quadtree row order after L layers over a [F, s, s, C] latent:
rows = (f, h0, w0, py1, px1, ..., pyL, pxL) with
h = ((h0*2+py1)*2+py2)...; i.e. each layer appends one (py, px) bit
pair.  ``quadtree_view`` produces the matching row order from a raster
NHWC tensor.

Flax ConvTranspose(2x2, s2, VALID) index semantics (probed numerically):
``y[2h+py, 2w+px, co] = sum_ci x[h, w, ci] * K[1-py, 1-px, ci, co]`` —
the kernel enters spatially FLIPPED.  The fold below bakes that in;
tests/test_decoder_fast.py asserts equivalence against the Flax module.

BatchNorm (inference) folds into the matmul as a per-channel affine
tiled over the four sub-pixel blocks.  GroupNorm computes per-sample
statistics over (H, W, C_group) and is NOT foldable into a constant
matmul, so this path requires ``norm='batch'`` — same constraint as the
fused input kernel (ops/encoder_pallas.py).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fold_decoder_params",
    "decode_quadtree",
    "quadtree_view",
    "raster_from_quadtree",
]


def fold_decoder_params(
    variables, dtype=jnp.bfloat16
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Fold the VideoDecoder's ConvTranspose + inference-BatchNorm stack
    into per-layer ``(W2 [C_in, 4*C_out], b2 [4*C_out])`` dense matmuls.

    Column order of each W2 is (py, px, c_out): row-major reshape of the
    output to [rows*4, C_out] appends the (py, px) bits to the row index
    — the quadtree step.  Raises ValueError for norm='group' models.
    """
    params = variables["params"]["decoder"]
    if "BatchNorm_0" not in params:
        raise ValueError(
            "fast decoder folds inference BatchNorm into the matmuls; "
            "this model was built with norm='group' — use the standard path"
        )
    stats = variables["batch_stats"]["decoder"]
    layers = []
    for i in range(4):
        k = np.asarray(params[f"ConvTranspose_{i}"]["kernel"], np.float32)  # [2,2,ci,co]
        b = np.asarray(params[f"ConvTranspose_{i}"]["bias"], np.float32)
        ci, co = k.shape[2], k.shape[3]
        # flipped-kernel semantics: output sub-pixel (py,px) reads K[1-py,1-px]
        w2 = k[::-1, ::-1].transpose(2, 0, 1, 3).reshape(ci, 4 * co).copy()
        b2 = np.tile(b, 4)
        if i < 3:  # BN + relu layers; the last layer is tanh, no norm
            bn = params[f"BatchNorm_{i}"]
            st = stats[f"BatchNorm_{i}"]
            inv = 1.0 / np.sqrt(np.asarray(st["var"], np.float32) + 1e-5)
            sc = np.asarray(bn["scale"], np.float32) * inv
            sh = np.asarray(bn["bias"], np.float32) - np.asarray(st["mean"], np.float32) * sc
            w2 = w2 * np.tile(sc, 4)
            b2 = b2 * np.tile(sc, 4) + np.tile(sh, 4)
        layers.append((jnp.asarray(w2, dtype), jnp.asarray(b2, jnp.float32)))
    return layers


def decode_quadtree(z: jnp.ndarray, folded) -> jnp.ndarray:
    """Run the folded decoder on latents ``z [..., s, s, C]``.

    Returns reconstruction rows in quadtree order, shape
    ``[prod(batch)*s*s*4**L, C_out]`` — compare against
    ``quadtree_view(x)`` or convert via ``raster_from_quadtree``.
    """
    x = z.reshape(-1, z.shape[-1])
    n = len(folded)
    for i, (w2, b2) in enumerate(folded):
        y = jnp.dot(x, w2, preferred_element_type=jnp.float32) + b2
        y = y.reshape(-1, y.shape[-1] // 4).astype(z.dtype)  # rows*4, C_out
        x = jax.nn.relu(y) if i < n - 1 else jnp.tanh(y)
    return x


def quadtree_view(x: jnp.ndarray, levels: int = 4) -> jnp.ndarray:
    """Raster NHWC ``[..., H, W, C]`` -> quadtree rows ``[N, C]`` matching
    ``decode_quadtree``'s row order (one (py, px) bit pair per level).

    This is a transpose; when consumed by an elementwise+reduce (the
    scoring step), XLA fuses it into the consumer's read.
    """
    *batch, h, w, c = x.shape
    h0, w0 = h >> levels, w >> levels
    shape = [int(np.prod(batch) or 1), h0] + [2] * levels + [w0] + [2] * levels + [c]
    x = x.reshape(shape)
    # axes: (B, h0, py1..pyL, w0, px1..pxL, C) -> (B, h0, w0, py1, px1, ...)
    perm = [0, 1, 2 + levels]
    for i in range(levels):
        perm += [2 + i, 3 + levels + i]
    perm.append(3 + 2 * levels)
    return x.transpose(perm).reshape(-1, c)


def raster_from_quadtree(
    y: jnp.ndarray, batch_shape, h: int, w: int, levels: int = 4
) -> jnp.ndarray:
    """Quadtree rows ``[N, C]`` -> raster ``[*batch_shape, H, W, C]``."""
    c = y.shape[-1]
    h0, w0 = h >> levels, w >> levels
    b = int(np.prod(batch_shape) or 1)
    shape = [b, h0, w0] + [2, 2] * levels + [c]
    y = y.reshape(shape)
    # (B, h0, w0, py1, px1, ...) -> (B, h0, py1..pyL, w0, px1..pxL, C)
    perm = [0, 1] + [3 + 2 * i for i in range(levels)] + [2] + [4 + 2 * i for i in range(levels)]
    perm.append(3 + 2 * levels)
    return y.transpose(perm).reshape(*batch_shape, h, w, c)
