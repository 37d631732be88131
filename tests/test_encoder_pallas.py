"""Fused first-encoder-block Pallas kernel vs the plain XLA block.

Interpreter mode on CPU (like test_pallas_convlstm.py); the compiled
kernel is exercised on hardware by bench.py and the serving path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vad_tpu.ops import encoder_pallas
from vad_tpu.ops.encoder_pallas import fold_first_block_params, fused_first_block


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    real_call = pl.pallas_call
    monkeypatch.setattr(
        encoder_pallas.pl, "pallas_call", functools.partial(real_call, interpret=True)
    )


def reference_block(u8_nhwc, kernel, bias, mean, var, scale, bn_bias, slope=0.2):
    x = u8_nhwc.astype(jnp.float32) / 127.5 - 1.0
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bn_bias
    y = jnp.where(y >= 0, y, slope * y)
    # maxpool 2x2
    f, h, w, c = y.shape
    y = y.reshape(f, h // 2, 2, w // 2, 2, c)
    return jnp.max(y, axis=(2, 4))


def _params(rng, c1):
    kernel = rng.normal(size=(3, 3, 3, c1)).astype(np.float32) * 0.2
    bias = rng.normal(size=(c1,)).astype(np.float32) * 0.1
    mean = rng.normal(size=(c1,)).astype(np.float32) * 0.05
    var = rng.uniform(0.5, 2.0, size=(c1,)).astype(np.float32)
    scale = rng.normal(size=(c1,)).astype(np.float32)  # sign-mixed on purpose
    bn_bias = rng.normal(size=(c1,)).astype(np.float32) * 0.1
    return kernel, bias, mean, var, scale, bn_bias


@pytest.mark.parametrize("f,h,w", [(2, 64, 64), (1, 32, 96)])
def test_matches_xla_block(f, h, w):
    rng = np.random.default_rng(0)
    c1 = 32
    kernel, bias, mean, var, scale, bn_bias = _params(rng, c1)
    u8 = rng.integers(0, 255, size=(f, h, w, 3), dtype=np.uint8)

    ref = reference_block(
        jnp.asarray(u8), jnp.asarray(kernel), jnp.asarray(bias), jnp.asarray(mean),
        jnp.asarray(var), jnp.asarray(scale), jnp.asarray(bn_bias),
    )

    w_band, bias_folded = fold_first_block_params(kernel, bias, mean, var, scale, bn_bias)
    got = fused_first_block(
        jnp.asarray(u8.reshape(f, h, w * 3)),
        jnp.asarray(w_band),
        jnp.asarray(bias_folded),
        c1=c1,
        out_dtype=jnp.float32,
    )
    assert got.shape == (f, h // 2, w // 2, c1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_stream_step_u8_matches_stream_step():
    """Full serving path: fused first block + skip-first encoder + flat
    error equals the plain stream_step on the same bytes."""
    from vad_tpu.models.video_autoencoder import ConvLSTM, VideoAutoencoder
    from vad_tpu.ops.encoder_pallas import fold_from_variables

    rng = np.random.default_rng(2)
    b, t, h, w = 2, 3, 64, 64
    model = VideoAutoencoder()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, h, w, 3)), train=False)
    u8 = rng.integers(0, 255, size=(b, t, h, w, 3), dtype=np.uint8)
    lat = h // 16
    states = ConvLSTM.zero_state(model.lstm_layers, b, lat, lat, model.lstm_hidden_dim)

    x = jnp.asarray(u8, jnp.float32) / 127.5 - 1.0
    recon, err, scores, new_states = model.apply(
        variables, x, states, method=VideoAutoencoder.stream_step
    )

    w_band, bias_folded = fold_from_variables(variables)
    recon_f, err_f, scores_f, states_f = model.apply(
        variables,
        jnp.asarray(u8.reshape(b, t, h, w * 3)),
        states,
        jnp.asarray(w_band, jnp.float32),
        jnp.asarray(bias_folded, jnp.float32),
        method=VideoAutoencoder.stream_step_u8,
    )
    np.testing.assert_allclose(np.asarray(scores_f), np.asarray(scores), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(err_f), np.asarray(err), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(recon_f), np.asarray(recon.reshape(b, t, h, w * 3)), atol=1e-4, rtol=1e-3
    )
    for (h1, c1_), (h2, c2_) in zip(new_states, states_f):
        np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(c2_), np.asarray(c1_), atol=1e-4, rtol=1e-3)


def test_multistream_scorer_fused_input():
    """MultiStreamScorer(fused_input=True) matches the plain scorer."""
    from vad_tpu.eval.serving import MultiStreamScorer
    from vad_tpu.models.video_autoencoder import VideoAutoencoder

    rng = np.random.default_rng(3)
    size, slots, chunk = 64, 2, 3
    model = VideoAutoencoder()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, size, size, 3)), train=False)
    frames = rng.integers(0, 255, size=(slots, chunk, size, size, 3), dtype=np.uint8)

    plain = MultiStreamScorer(model, variables, slots, chunk, size, return_maps=True,
                              fused_input=False)
    fused = MultiStreamScorer(model, variables, slots, chunk, size, return_maps=True,
                              fused_input=True)
    for s in range(slots):
        plain.attach(s)
        fused.attach(s)
    sp, mp = plain.score_chunk(frames)
    sf, mf = fused.score_chunk(frames)
    np.testing.assert_allclose(sf, sp, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(mf, mp, atol=1e-4, rtol=1e-3)


def test_bf16_close_to_f32():
    rng = np.random.default_rng(1)
    c1 = 32
    params = _params(rng, c1)
    u8 = rng.integers(0, 255, size=(1, 32, 32, 3), dtype=np.uint8)
    w_band, bias_folded = fold_first_block_params(*params)
    flat = jnp.asarray(u8.reshape(1, 32, 96))
    f32 = fused_first_block(flat, jnp.asarray(w_band), jnp.asarray(bias_folded), c1=c1, out_dtype=jnp.float32)
    bf16 = fused_first_block(flat, jnp.asarray(w_band), jnp.asarray(bias_folded), c1=c1, out_dtype=jnp.bfloat16)
    err = np.max(np.abs(np.asarray(bf16, np.float32) - np.asarray(f32)))
    scale = np.max(np.abs(np.asarray(f32))) + 1e-6
    assert err / scale < 0.05
