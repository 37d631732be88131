"""int8 PTQ probe at the real serving encoder shapes (v5e).

Times the 4-block double-conv encoder stack at the bench workload
(256 frames @ 256x256) in bf16 vs int8-everywhere vs mixed.
Chained via fori_loop with a rolled input so XLA cannot hoist.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

K = 20
F = 256  # 16 streams x 16 frames
dn = ('NHWC', 'HWIO', 'NHWC')
WIDTHS = (32, 64, 128, 128)


def timeit(fn, *args, reps=3):
    np.asarray(fn(*args))
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def conv_bf(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), 'SAME', dimension_numbers=dn)


def conv_i8(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), 'SAME', dimension_numbers=dn,
                                    preferred_element_type=jnp.int32)


def block_bf(x, w1, w2):
    x = nnleaky(conv_bf(x, w1))
    x = conv_bf(x, w2)
    x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')
    return nnleaky(x)


def nnleaky(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def requant(y_i32, scale):
    # int32 accum -> f32 scale -> leaky -> round/clip to int8 (fused epilogue)
    y = y_i32.astype(jnp.float32) * scale
    y = nnleaky(y)
    return jnp.clip(jnp.round(y * 8.0), -127, 127).astype(jnp.int8)


def block_i8(x, w1, w2):
    x = requant(conv_i8(x, w1), 1e-3)
    y = conv_i8(x, w2)
    # pool on int32 (max is order-preserving), then requant
    y = lax.reduce_window(y, jnp.iinfo(jnp.int32).min, lax.max,
                          (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')
    return requant(y, 1e-3)


def make_weights(dtype):
    ws, cin = [], 3
    rng = np.random.default_rng(0)
    for cout in WIDTHS:
        if dtype == jnp.int8:
            w1 = rng.integers(-20, 20, (3, 3, cin, cout)).astype(np.int8)
            w2 = rng.integers(-20, 20, (3, 3, cout, cout)).astype(np.int8)
        else:
            w1 = (rng.standard_normal((3, 3, cin, cout)) * 0.05).astype(np.float32)
            w2 = (rng.standard_normal((3, 3, cout, cout)) * 0.05).astype(np.float32)
        ws.append((jnp.asarray(w1, dtype), jnp.asarray(w2, dtype)))
        cin = cout
    return ws


x_u8 = jnp.asarray(np.random.randint(0, 256, (F, 256, 256, 3)), jnp.uint8)
ws_bf = make_weights(jnp.bfloat16)
ws_i8 = make_weights(jnp.int8)


def chained(encoder_fn):
    @jax.jit
    def run(x0):
        def body(i, carry):
            x, acc = carry
            out = encoder_fn(x)
            acc = acc + out.astype(jnp.float32).mean()
            return (jnp.roll(x, 1, axis=0), acc)
        _, acc = lax.fori_loop(0, K, body, (x0, jnp.float32(0)))
        return acc
    return run


def enc_bf(x_u8):
    x = x_u8.astype(jnp.bfloat16) / 127.5 - 1.0
    for w1, w2 in ws_bf:
        x = block_bf(x, w1, w2)
    return x


def enc_i8(x_u8):
    x = (x_u8.astype(jnp.int16) - 128).astype(jnp.int8)  # center, stays int8
    for w1, w2 in ws_i8:
        x = block_i8(x, w1, w2)
    return x


def enc_mixed(x_u8):
    # block1 in bf16 (layout-bound, int8 may not help), rest int8
    x = x_u8.astype(jnp.bfloat16) / 127.5 - 1.0
    x = block_bf(x, *ws_bf[0])
    x = jnp.clip(jnp.round(x.astype(jnp.float32) * 8.0), -127, 127).astype(jnp.int8)
    for w1, w2 in ws_i8[1:]:
        x = block_i8(x, w1, w2)
    return x


def enc_i8_block1_bf_rest(x_u8):
    # block1 int8 (halved materialization bytes?), rest bf16
    x = (x_u8.astype(jnp.int16) - 128).astype(jnp.int8)
    x = block_i8(x, *ws_i8[0])
    x = x.astype(jnp.bfloat16) / 8.0
    for w1, w2 in ws_bf[1:]:
        x = block_bf(x, w1, w2)
    return x


for name, fn in [('bf16   ', enc_bf), ('int8   ', enc_i8), ('mixed  ', enc_mixed),
                 ('i8b1   ', enc_i8_block1_bf_rest)]:
    t = timeit(chained(fn), x_u8)
    print(f"encoder {name}: {t:7.3f} ms  ({F / t * 1e3:,.0f} frames/s)")
