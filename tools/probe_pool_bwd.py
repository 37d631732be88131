"""Measured record: a Pallas 2x2 max-pool BACKWARD kernel vs XLA.

bench context: tools/profile_train.py found the pool backward
(select-and-scatter) to be the largest single training overhead
(~5.7 ms bf16 / ~9.6 ms f32 in-context at block1).  This probe holds
the full measurement landscape that CLOSED the question:

1. Standalone, dispatch-amortized (lax.fori_loop chains), XLA's
   select-and-scatter costs a UNIFORM ~2.3x its HBM floor at every
   encoder pool shape and both dtypes (C=32..128, 256^2..32^2) — the
   in-context increments look worse (3.3-3.7x) because they include
   the VJP residual traffic around the op, which any custom kernel
   pays identically.
2. This kernel — rank-3 [N*H, W, C] blocks with the row dim untiled,
   H-mates via free block indexing, W-mates via sublane rotates,
   equal-tie-split counts, gradient-EXACT vs the jnp.max autodiff
   oracle (max|d| = 0.0 including ties) — lands at 2.2-2.7x floor on
   f32 across rb/count variants: PARITY with select-and-scatter at
   best, never a win.  bf16 variants fail Mosaic compilation
   (no bf16 rotate; jnp.repeat lowering).
3. Lane-chunked designs for C<128 (chunk-duplication via rotate
   chains or MXU 0/1-matrix expansions) cost strictly more vector
   work per element than this C=128 variant, so they cannot land
   lower.

CONCLUSION: XLA's select-and-scatter is at the practical floor for
this op on v5e; the training step keeps it.  Kept as a runnable
record (python tools/probe_pool_bwd.py, needs the real TPU).
"""

import time, json, functools
import numpy as np
import jax, jax.numpy as jnp
import flax.linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[0])

def bench(f, args, n=8, reps=5):
    out = f(*args); fetch(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n): out = f(*args)
        fetch(out)
        best = min(best, (time.time()-t0)/n)
    return best*1e3

def chain_k(f, k):
    def run(x, g):
        return jax.lax.fori_loop(0, k, lambda i, v: f(v, g), x)
    return run

def make_pool_bwd(rb, cnt_mode="full", native=True):
    def _kern(x_ref, g_ref, dx_ref):
        for h in range(rb):
            xh = x_ref[h]
            xm = x_ref[h ^ 1]
            gh = g_ref[h // 2]
            g2 = jnp.repeat(gh, 2, axis=0)
            q = jnp.maximum(xh, xm)
            wlen = q.shape[0]
            qf = q if (native and q.dtype == jnp.float32) else q.astype(jnp.float32)
            up = pltpu.roll(qf, wlen - 1, axis=0)
            dn = pltpu.roll(qf, 1, axis=0)
            sidx = jax.lax.broadcasted_iota(jnp.int32, q.shape, 0)
            even = (sidx % 2) == 0
            m = jnp.maximum(qf, jnp.where(even, up, dn)).astype(xh.dtype)
            eq = xh == m
            if cnt_mode == "full":
                ep = eq.astype(jnp.float32) + (xm == m).astype(jnp.float32)
                cnt = ep + jnp.where(even, pltpu.roll(ep, wlen - 1, axis=0),
                                     pltpu.roll(ep, 1, axis=0))
                dx_ref[h] = jnp.where(eq, (g2.astype(jnp.float32) / cnt).astype(xh.dtype), 0)
            else:  # no tie normalization (ties double-count): fewer ops
                dx_ref[h] = jnp.where(eq, g2, jnp.zeros_like(g2))
    def pool_bwd(x, g):
        n, hh, w, c = x.shape
        xv = x.reshape(n*hh, w, c)
        gv = g.reshape(n*hh//2, w//2, c)
        dx = pl.pallas_call(
            _kern, grid=(n*hh // rb,),
            in_specs=[pl.BlockSpec((rb, w, c), lambda i: (i, 0, 0)),
                      pl.BlockSpec((rb // 2, w // 2, c), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((rb, w, c), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n*hh, w, c), x.dtype),
        )(xv, gv)
        return dx.reshape(n, hh, w, c)
    return pool_bwd

rng = np.random.default_rng(0)
for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
    X = jnp.asarray(rng.standard_normal((128, 64, 64, 128)), dt)
    G = jnp.asarray(rng.standard_normal((128, 32, 32, 128)), dt)
    floor = (X.size*2 + G.size) * (4 if dt==jnp.float32 else 2) / 819e9 * 1e3
    for label, f in (
        ("rb16 full", make_pool_bwd(16)),
        ("rb32 full", make_pool_bwd(32)),
        ("rb64 full", make_pool_bwd(64)),
        ("rb32 nocnt", make_pool_bwd(32, cnt_mode="nocnt")),
    ):
        try:
            t1 = bench(jax.jit(chain_k(f, 2)), (X, G))
            t2 = bench(jax.jit(chain_k(f, 10)), (X, G))
            per = (t2 - t1) / 8
            print(json.dumps({"dtype": name, "variant": label,
                "per_op_ms": round(per,3), "x_floor": round(per/floor,2)}), flush=True)
        except Exception as e:
            print(json.dumps({"dtype": name, "variant": label, "error": str(e)[:120]}), flush=True)
