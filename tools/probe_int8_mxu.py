"""Does the v5e conv emitter hit the int8 MXU path? Chained-steps probe.

Each timed unit is ONE jit call that runs K dependent convs (output fed
back as input through a cast), so tunnel RTT (~23 ms) amortizes over K.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

K = 50  # chained steps per dispatch

dn = ('NHWC', 'HWIO', 'NHWC')
B, H, W, C = 256, 64, 64, 64
kk = (3, 3)

def timeit(fn, *args, reps=3):
    np.asarray(fn(*args)).ravel()[:1]  # compile + real fetch
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)  # force device->host fetch through the tunnel
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3  # ms per conv


@jax.jit
def chain_bf16(x, w):
    def body(i, x):
        y = lax.conv_general_dilated(x, w, (1, 1), 'SAME', dimension_numbers=dn)
        return (y * 1e-3).astype(jnp.bfloat16)
    return lax.fori_loop(0, K, body, x).astype(jnp.float32).mean()


@jax.jit
def chain_i8(x, w):
    def body(i, x):
        y = lax.conv_general_dilated(x, w, (1, 1), 'SAME', dimension_numbers=dn,
                                     preferred_element_type=jnp.int32)
        return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)
    return lax.fori_loop(0, K, body, x).astype(jnp.float32).mean()


x_bf = jnp.asarray(np.random.randn(B, H, W, C), jnp.bfloat16)
w_bf = jnp.asarray(np.random.randn(*kk, C, C) * 0.1, jnp.bfloat16)
x_i8 = jnp.asarray(np.random.randint(-127, 127, (B, H, W, C)), jnp.int8)
w_i8 = jnp.asarray(np.random.randint(-127, 127, (*kk, C, C)), jnp.int8)

flops = 2 * B * H * W * C * (kk[0] * kk[1] * C)
t_bf = timeit(chain_bf16, x_bf, w_bf)
print(f"bf16 conv: {t_bf:.3f} ms/conv -> {flops / t_bf / 1e9:.1f} TFLOP/s")
try:
    t_i8 = timeit(chain_i8, x_i8, w_i8)
    print(f"int8 conv: {t_i8:.3f} ms/conv -> {flops / t_i8 / 1e9:.1f} TOP/s  "
          f"(speedup {t_bf / t_i8:.2f}x)")
except Exception as e:
    print("int8 conv FAILED:", repr(e)[:300])

# dot-product control: int8 MXU is known-good for dots
N = 4096
fl = 2 * N ** 3

@jax.jit
def dchain_bf(a, b):
    def body(i, a):
        return ((a @ b) * 1e-4).astype(jnp.bfloat16)
    return lax.fori_loop(0, K, body, a).astype(jnp.float32).mean()

@jax.jit
def dchain_i8(a, b):
    def body(i, a):
        y = lax.dot(a, b, preferred_element_type=jnp.int32)
        return jnp.clip(y >> 12, -127, 127).astype(jnp.int8)
    return lax.fori_loop(0, K, body, a).astype(jnp.float32).mean()

a_bf = jnp.asarray(np.random.randn(N, N), jnp.bfloat16)
b_bf = jnp.asarray(np.random.randn(N, N), jnp.bfloat16)
a_i8 = jnp.asarray(np.random.randint(-127, 127, (N, N)), jnp.int8)
b_i8 = jnp.asarray(np.random.randint(-127, 127, (N, N)), jnp.int8)

t = timeit(dchain_bf, a_bf, b_bf)
print(f"bf16 dot: {t:.3f} ms/dot -> {fl / t / 1e9:.0f} TFLOP/s")
try:
    t2 = timeit(dchain_i8, a_i8, b_i8)
    print(f"int8 dot: {t2:.3f} ms/dot -> {fl / t2 / 1e9:.0f} TOP/s (speedup {t / t2:.2f}x)")
except Exception as e:
    print("int8 dot FAILED:", repr(e)[:300])
