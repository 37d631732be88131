"""Model unit tests: shapes, parameter-count parity, gate math oracle.

Parameter counts must match the reference exactly (README.md:302,311 /
SURVEY §6): image model 1,546,147 and video model 2,709,411 trainable
parameters at default hyperparameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vad_tpu.models.autoencoder import ConvAutoencoder
from vad_tpu.models.video_autoencoder import (
    ConvLSTMCell,
    ConvLSTMLayer,
    VideoAutoencoder,
    convlstm_step,
)


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


class TestConvAutoencoder:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = ConvAutoencoder()
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
        return model, variables

    def test_param_count_matches_reference(self, model_and_vars):
        _, variables = model_and_vars
        assert n_params(variables["params"]) == 1_546_147

    def test_forward_shape(self, model_and_vars):
        model, variables = model_and_vars
        x = jnp.zeros((2, 64, 64, 3))
        y = model.apply(variables, x, train=False)
        assert y.shape == x.shape

    def test_output_range_is_tanh(self, model_and_vars):
        model, variables = model_and_vars
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
        y = model.apply(variables, x, train=False)
        assert float(jnp.max(jnp.abs(y))) <= 1.0

    def test_error_shapes_and_reduction_order(self, model_and_vars):
        model, variables = model_and_vars
        x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 64, 64, 3)), jnp.float32)
        emap = model.apply(variables, x, per_pixel=True, method=ConvAutoencoder.reconstruction_error)
        escal = model.apply(variables, x, method=ConvAutoencoder.reconstruction_error)
        assert emap.shape == (3, 64, 64)
        assert escal.shape == (3,)
        # scalar score is the mean of the per-pixel map (reference
        # autoencoder.py:211-221 reduction order).
        np.testing.assert_allclose(np.mean(np.asarray(emap), axis=(1, 2)), np.asarray(escal), rtol=1e-6)

    def test_latent_shape(self, model_and_vars):
        model, variables = model_and_vars
        x = jnp.zeros((2, 64, 64, 3))
        z = model.apply(variables, x, method=ConvAutoencoder.encode)
        assert z.shape == (2, 4, 4, 256)  # 64 / 2^4 = 4 spatial, latent 256


class TestVideoAutoencoder:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = VideoAutoencoder()
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 2, 64, 64, 3)), train=False
        )
        return model, variables

    def test_param_count_matches_reference(self, model_and_vars):
        _, variables = model_and_vars
        assert n_params(variables["params"]) == 2_709_411

    def test_forward_shape(self, model_and_vars):
        model, variables = model_and_vars
        x = jnp.zeros((2, 4, 64, 64, 3))
        y = model.apply(variables, x, train=False)
        assert y.shape == x.shape

    def test_error_granularities(self, model_and_vars):
        model, variables = model_and_vars
        x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 4, 64, 64, 3)), jnp.float32)
        e_seq = model.apply(variables, x, method=VideoAutoencoder.reconstruction_error)
        e_frame = model.apply(
            variables, x, per_frame=True, method=VideoAutoencoder.reconstruction_error
        )
        e_pix = model.apply(
            variables, x, per_pixel=True, method=VideoAutoencoder.reconstruction_error
        )
        assert e_seq.shape == (2,)
        assert e_frame.shape == (2, 4)
        assert e_pix.shape == (2, 4, 64, 64)
        np.testing.assert_allclose(
            np.mean(np.asarray(e_frame), axis=1), np.asarray(e_seq), rtol=1e-6
        )

    def test_projection_only_when_dims_differ(self):
        m = VideoAutoencoder(latent_dim=64, lstm_hidden_dim=32)
        v = m.init(jax.random.key(0), jnp.zeros((1, 2, 32, 32, 3)), train=False)
        assert "proj" in v["params"]
        y = m.apply(v, jnp.zeros((1, 2, 32, 32, 3)), train=False)
        assert y.shape == (1, 2, 32, 32, 3)


class TestConvLSTMGateMath:
    def test_step_matches_numpy_oracle(self):
        """Gate semantics vs a from-scratch numpy implementation of
        reference video_autoencoder.py:67-83 (i, f, g, o split order)."""
        rng = np.random.default_rng(3)
        b, hgt, wid, ch = 2, 4, 4, 8
        gates_x = rng.normal(size=(b, hgt, wid, 4 * ch)).astype(np.float32)
        h = rng.normal(size=(b, hgt, wid, ch)).astype(np.float32)
        c = rng.normal(size=(b, hgt, wid, ch)).astype(np.float32)
        # 1x1 hidden kernel so the oracle is a plain matmul over channels.
        w_h = rng.normal(size=(1, 1, ch, 4 * ch)).astype(np.float32) * 0.1

        # default matmul precision is bf16-multiply on TPU (and emulated on
        # CPU); pin highest so the f32 numpy oracle comparison is exact.
        with jax.default_matmul_precision("highest"):
            h2, c2 = convlstm_step(
                jnp.asarray(gates_x), jnp.asarray(h), jnp.asarray(c), jnp.asarray(w_h)
            )

        def sig(v):
            return 1.0 / (1.0 + np.exp(-v))

        gates = gates_x + h @ w_h[0, 0]
        i, f, g, o = np.split(gates, 4, axis=-1)
        c_ref = sig(f) * c + sig(i) * np.tanh(g)
        h_ref = sig(o) * np.tanh(c_ref)
        # XLA and numpy f32 sigmoid/tanh differ at the few-ULP level (~3e-5)
        np.testing.assert_allclose(np.asarray(c2), c_ref, rtol=5e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(h2), h_ref, rtol=5e-3, atol=1e-4)

    def test_cell_matches_layer_scan(self):
        """Step-at-a-time cell and scanned layer agree over a sequence."""
        b, t, hgt, wid, cin, ch = 1, 5, 8, 8, 4, 8
        layer = ConvLSTMLayer(cin, ch)
        x = jnp.asarray(
            np.random.default_rng(4).normal(size=(b, t, hgt, wid, cin)), jnp.float32
        )
        lv = layer.init(jax.random.key(1), x)
        out_seq = layer.apply(lv, x)

        cell = ConvLSTMCell(cin, ch)
        cv = {"params": lv["params"]}  # identical param structure: kernel+bias
        h, c = ConvLSTMCell.init_state(b, hgt, wid, ch)
        outs = []
        for i in range(t):
            h, c = cell.apply(cv, x[:, i], (h, c))
            outs.append(h)
        stepped = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(
            np.asarray(out_seq), np.asarray(stepped), rtol=1e-5, atol=1e-6
        )
