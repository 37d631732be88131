"""Ablation of the fused first-block Pallas kernel's internal stages.

probe_block1.py shows v1 (6 accumulated K=102 dots) and v2 (2 single
K=306 dots) both run ~5.6-5.8 ms per 256-frame chunk — restructuring the
MXU calls changed nothing, so the cost is NOT accumulator round trips.
This script times stripped-down kernel variants to attribute the ~22 us
per-frame budget among: grid/DMA overhead, u8->f32 widening, band
assembly (rolls/masks/concats), the dots, and the leaky/max epilogue.

Variants (all same grid/BlockSpecs/output shape):
  full        — the production v2 kernel
  no-band     — X built by tiling the unshifted even plane (no rolls,
                no masks, no shift_h); dots + epilogue intact
  no-dot      — X assembled fully, dots replaced by broadcasting bias
  no-epilogue — dots intact, epilogue replaced by a slice+cast store
  dma-only    — load planes, store a cast slice (floor: grid + DMA + cast)

Usage: python tools/ablate_block1.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vad_tpu.ops.encoder_pallas import GROUP, HALO, KLANES


def make_kernel(mode, hh, g, c1, negative_slope, pad_u):
    def kernel(xe_ref, xo_ref, wb_ref, bias_ref, out_ref):
        m = hh * g
        n = GROUP * c1

        even = xe_ref[0, :, 0].astype(jnp.int32).astype(jnp.float32).reshape(m, 96)
        odd = xo_ref[0, :, 0].astype(jnp.int32).astype(jnp.float32).reshape(m, 96)

        if mode == "dma-only":
            out_ref[0] = (
                jnp.concatenate([even, odd, even, odd, even, odd][: (n // 2) // 96 + 1], axis=1)[
                    :, : n // 2
                ]
                .reshape(hh, g, n // 2)
                .astype(out_ref.dtype)
            )
            return

        rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        gi = rows % g
        first_g = gi == 0
        last_g = gi == g - 1

        def band_x(src):
            prev = pltpu.roll(src, 1, axis=0)[:, 96 - HALO :]
            nxt = pltpu.roll(src, m - 1, axis=0)[:, :HALO]
            prev = jnp.where(first_g, pad_u, prev)
            nxt = jnp.where(last_g, pad_u, nxt)
            return jnp.concatenate([prev, src, nxt], axis=1)

        def shift_h(src, dh):
            rolled = pltpu.roll(src, (-dh * g) % m, axis=0)
            if dh > 0:
                return jnp.where(rows >= m - g, pad_u, rolled)
            return jnp.where(rows < g, pad_u, rolled)

        dtype = wb_ref.dtype
        if mode == "no-band":
            pe = jnp.pad(even, ((0, 0), (0, KLANES - 96))).astype(dtype)
            po = jnp.pad(odd, ((0, 0), (0, KLANES - 96))).astype(dtype)
            x0 = jnp.concatenate([po, pe, po], axis=1)
            x1 = jnp.concatenate([pe, po, pe], axis=1)
        else:
            be = band_x(even).astype(dtype)
            bo = band_x(odd).astype(dtype)
            x0 = jnp.concatenate([band_x(shift_h(odd, -1)).astype(dtype), be, bo], axis=1)
            x1 = jnp.concatenate([be, bo, band_x(shift_h(even, 1)).astype(dtype)], axis=1)

        if mode == "no-dot":
            acc0 = jnp.broadcast_to(bias_ref[0], (m, n)) + x0[:, :1]
            acc1 = jnp.broadcast_to(bias_ref[0], (m, n)) + x1[:, :1]
        else:
            w = wb_ref[...]
            acc0 = jax.lax.dot(x0, w, preferred_element_type=jnp.float32) + bias_ref[0]
            acc1 = jax.lax.dot(x1, w, preferred_element_type=jnp.float32) + bias_ref[0]

        if mode == "no-epilogue":
            out_ref[0] = acc0[:, : n // 2].reshape(hh, g, n // 2).astype(out_ref.dtype)
            return

        def leaky(x):
            return jnp.where(x >= 0, x, negative_slope * x)

        half = n // 2
        z0 = jnp.maximum(leaky(acc0[:, :half]), leaky(acc0[:, half:]))
        z1 = jnp.maximum(leaky(acc1[:, :half]), leaky(acc1[:, half:]))
        out_ref[0] = jnp.maximum(z0, z1).reshape(hh, g, half).astype(out_ref.dtype)

    return kernel


def main() -> None:
    F, H = 256, 256
    c1 = 32
    hh, g = H // 2, H * 3 // 96
    n = GROUP * c1
    out_dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    x5 = jnp.asarray(
        rng.integers(0, 255, size=(F, hh, 2, g, 96), dtype=np.uint8)
    )
    wb = jnp.asarray(rng.standard_normal((3 * KLANES, n)) * 0.05, out_dtype)
    bias2 = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)

    def build(mode):
        kernel = make_kernel(mode, hh, g, c1, 0.2, 127.5)
        return pl.pallas_call(
            kernel,
            grid=(F,),
            in_specs=[
                pl.BlockSpec((1, hh, 1, g, 96), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hh, 1, g, 96), lambda i: (i, 0, 1, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * KLANES, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, hh, g, n // 2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((F, hh, g, n // 2), out_dtype),
        )

    def bench(fn, nrep=30, reps=5):
        # NOTE: on the axon tunnel, block_until_ready alone does not
        # synchronize an executable that has never had a host fetch —
        # dispatches queue and every "timing" reads ~0.02 ms.  Prime with
        # a real fetch, then end each rep with a tiny-slice fetch (waits
        # for the whole array; ~1 ms tunnel latency amortized over nrep).
        f = jax.jit(fn)
        np.asarray(f(x5, x5, wb, bias2)[0, 0, 0, :1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = None
            for _ in range(nrep):
                out = f(x5, x5, wb, bias2)
            np.asarray(out[0, 0, 0, :1])
            best = min(best, (time.time() - t0) / nrep)
        return best * 1e3

    for mode in ["dma-only", "no-dot", "no-band", "no-epilogue", "full"]:
        ms = bench(build(mode))
        print(f"{mode:12s} {ms:7.2f} ms  ({ms / F * 1e3:5.1f} us/frame)", flush=True)


if __name__ == "__main__":
    main()
