"""Per-stage profile of the video TRAINING step on the real TPU.

Companion to tools/profile_blocks.py (which attributed the 13 ms
SCORING step).  bench.py's training configs show MFU 0.18 (bf16, B=8,
fwd+bwd+update counted as 3x forward FLOPs) against 0.29 for scoring —
this tool answers where the extra backward/update time goes and which
stages run below the forward path's efficiency.

Method: cumulative-prefix timing through ``jax.value_and_grad``.  Build
jitted programs computing d(sum(prefix_k(x)))/d(params) where prefix_k
runs the REAL Flax submodules in train mode (batch-stats mutation
included), and time each: the increment between prefix k and k-1 is
that stage's forward+backward cost as the full program pays it (XLA
still fuses freely inside each prefix).  A forward-only row per prefix
splits fwd from bwd.  The full compiled train step (masked-mean loss +
Adam + BN-stat write, exactly train/steps.py::make_train_step) closes
the table, so update overhead = full step minus full-objective grad.

Extra experiments, switchable by flag:
  --pool     microbench 2x2 max-pool fwd+bwd: flax nn.max_pool
             (reduce_window -> select-and-scatter backward) vs a
             reshape-and-max formulation at every encoder block shape.
  --backend  compare the recurrence backends' fwd+bwd (pallas custom
             VJP vs XLA scan autodiff) at the training shape.

Usage:  python tools/profile_train.py [--pool] [--backend]
Output: JSON lines + a markdown table (pasted into COMPONENTS.md).
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


def fetch_barrier(out):
    """Device->host fetch of one scalar-ish leaf as the completion
    barrier: under the remote-TPU tunnel plain block_until_ready has
    proven unreliable (see bench.py); a real fetch of the LAST program's
    output waits for every earlier program too (in-order execution)."""
    leaf = next(iter(__import__("jax").tree.leaves(out)))
    np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[0])


def bench_fn(f, args, n=10, reps=5):
    out = f(*args)
    fetch_barrier(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        fetch_barrier(out)
        best = min(best, (time.time() - t0) / n)
    return best * 1e3  # ms


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vad_tpu.models.video_autoencoder import VideoAutoencoder
    from vad_tpu.ops.convlstm_pallas import preferred_backend
    from vad_tpu.ops.losses import make_per_sample_loss_fn
    from vad_tpu.parallel.sharding import get_mesh, train_state_shardings
    from vad_tpu.train.state import create_train_state
    from vad_tpu.train.steps import make_train_step, u8_normalize
    from vad_tpu.utils.precision import cast_floating

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--pool", action="store_true")
    ap.add_argument("--backend", action="store_true")
    ap.add_argument("--f32", action="store_true", help="profile the f32 step")
    ap.add_argument("--stem", default="pool", choices=["pool", "stride2"],
                    help="encoder stem to profile (round-4 directive #4: "
                    "attribute the stride2 step's remaining cost)")
    args = ap.parse_args()

    B, T, H = args.batch, args.chunk, args.size
    F = B * T
    cdt = None if args.f32 else jnp.bfloat16
    lat = H // 16

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, size=(B, T, H, H, 3), dtype=np.uint8))

    backend = preferred_backend(lat, lat, 128, context="training")
    model = VideoAutoencoder(backend=backend, stem=args.stem)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 2, H, H, 3)), train=False
    )
    params0 = variables["params"]
    stats0 = variables["batch_stats"]

    # ---- prefix objectives over the real train-mode submodules --------
    # Each returns sum(prefix output) as the scalar; batch-stat mutation
    # is carried exactly like the production objective (train/steps.py).
    def run_prefix(params, stats, x, upto: str):
        p = cast_floating(params, cdt) if cdt is not None else params
        xin = u8_normalize(x)
        xc = xin.astype(cdt) if cdt is not None else xin

        def fwd(mdl, z, train):
            b, t = z.shape[:2]
            y = mdl.encoder(z, train=train)
            if upto == "encoder":
                return y
            y = mdl.convlstm(y)
            if upto == "convlstm":
                return y
            return mdl.decoder(y, train=train)

        out, mutated = model.apply(
            {"params": p, "batch_stats": stats}, xc, True,
            mutable=["batch_stats"], method=fwd,
        )
        if upto == "loss":
            loss_fn = make_per_sample_loss_fn("mse", 0.5)
            losses = loss_fn(out.astype(jnp.float32), xin.astype(jnp.float32))
            return jnp.mean(losses), mutated
        return jnp.sum(out.astype(jnp.float32)), mutated

    stages = ["encoder", "convlstm", "decoder", "loss"]
    rows = []
    prev_f = prev_g = 0.0
    for upto in stages:

        def obj(params, stats, x, upto=upto):
            val, mutated = run_prefix(params, stats, x, upto)
            return val, mutated["batch_stats"]

        fwd = jax.jit(lambda p, s, x, u=upto: run_prefix(p, s, x, u)[0])
        grad = jax.jit(jax.value_and_grad(obj, has_aux=True))
        t_f = bench_fn(fwd, (params0, stats0, u8))
        t_g = bench_fn(grad, (params0, stats0, u8))
        rows.append((upto, t_f, t_f - prev_f, t_g, t_g - prev_g))
        prev_f, prev_g = t_f, t_g
        print(json.dumps({
            "prefix": upto, "fwd_ms": round(t_f, 2),
            "fwd_inc_ms": round(rows[-1][2], 2),
            "fwd+bwd_ms": round(t_g, 2),
            "fwd+bwd_inc_ms": round(rows[-1][4], 2),
        }), flush=True)

    # ---- the full compiled production step ----------------------------
    mesh = get_mesh()
    state = create_train_state(model, variables, 1e-4, weight_decay=1e-5)
    step = make_train_step(
        make_per_sample_loss_fn("mse", 0.5), mesh, preprocess=u8_normalize,
        state_shardings=train_state_shardings(state, mesh), compute_dtype=cdt,
    )
    n_real = jnp.asarray(B, jnp.int32)
    state, loss = step(state, u8, n_real)  # compile (donates state)
    np.asarray(loss)
    n, reps, best = 10, 5, float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n):
            state, loss = step(state, u8, n_real)
        np.asarray(loss)
        best = min(best, (time.time() - t0) / n)
    t_step = best * 1e3
    print(json.dumps({"full_train_step_ms": round(t_step, 2),
                      "adam+bn_overhead_ms": round(t_step - rows[-1][3], 2)}),
          flush=True)

    from bench import model_flops_per_frame

    flops_fwd = model_flops_per_frame(H, stem=args.stem) * F
    print("\n| prefix | fwd ms (inc) | fwd+bwd ms (inc) | bwd/fwd |")
    print("|---|---|---|---|")
    for name, t_f, inc_f, t_g, inc_g in rows:
        ratio = (inc_g - inc_f) / inc_f if inc_f > 0.05 else float("nan")
        print(f"| {name} | {t_f:.2f} ({inc_f:.2f}) | {t_g:.2f} ({inc_g:.2f}) | {ratio:.1f}x |")
    print(f"| full step (+Adam+BN write) | — | {t_step:.2f} | — |")
    print(f"\nMFU(step, 3x-fwd convention) = "
          f"{3 * flops_fwd / (t_step / 1e3) / PEAK_BF16:.3f}; "
          f"fwd-only MFU = {flops_fwd / (rows[2][1] / 1e3) / PEAK_BF16:.3f}")

    # ---- optional: pool backward microbench ---------------------------
    if args.pool:
        import flax.linen as nn

        print("\n2x2 max-pool fwd+bwd at encoder shapes (ms):")
        dt = jnp.float32 if args.f32 else jnp.bfloat16
        for (hh, c) in ((H, 32), (H // 2, 64), (H // 4, 128), (H // 8, 128)):
            x = jnp.asarray(rng.standard_normal((F, hh, hh, c)), dt)

            def g_rw(x):
                return jax.grad(lambda z: jnp.sum(
                    nn.max_pool(z, (2, 2), strides=(2, 2)).astype(jnp.float32)
                ))(x)

            def g_rs(x):
                def pooled(z):
                    n, h, w, ch = z.shape
                    z = z.reshape(n, h // 2, 2, w // 2, 2, ch)
                    return jnp.sum(jnp.max(z, axis=(2, 4)).astype(jnp.float32))

                return jax.grad(pooled)(x)

            t_rw = bench_fn(jax.jit(g_rw), (x,))
            t_rs = bench_fn(jax.jit(g_rs), (x,))
            print(json.dumps({
                "shape": [F, hh, hh, c], "reduce_window_ms": round(t_rw, 3),
                "reshape_max_ms": round(t_rs, 3),
            }), flush=True)

    # ---- optional: recurrence backend backward comparison -------------
    if args.backend:
        print("\nConvLSTM fwd+bwd by backend (ms), training shape:")
        z = jnp.asarray(rng.standard_normal((B, T, lat, lat, 128)),
                        jnp.float32 if args.f32 else jnp.bfloat16)
        for be in ("pallas", "xla"):
            m = VideoAutoencoder(backend=be)
            v = m.init(jax.random.key(0), jnp.zeros((1, 2, H, H, 3)), train=False)

            pz = cast_floating(v["params"], z.dtype)

            def obj(params, z, m=m, v=v):
                out = m.apply(
                    {"params": params, "batch_stats": v["batch_stats"]}, z,
                    method=lambda mdl, zz: mdl.convlstm(zz),
                )
                return jnp.sum(out.astype(jnp.float32))

            g = jax.jit(jax.grad(obj))
            t = bench_fn(g, (pz, z))
            print(json.dumps({"backend": be, "fwd+bwd_ms": round(t, 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
