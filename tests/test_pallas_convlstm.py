"""Fused Pallas ConvLSTM kernel vs the XLA lax.scan reference path.

Runs in Pallas interpreter mode on CPU (the test env has no real TPU
grid); the same kernel compiles with Mosaic on device — bench.py exercises
that on hardware.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vad_tpu.models.video_autoencoder import convlstm_step
from vad_tpu.ops import convlstm_pallas
from vad_tpu.ops.convlstm_pallas import convlstm_recurrence_pallas, pallas_supported


def xla_reference(gates_x, w_h, h0, c0):
    def step(carry, g_t):
        h, c = carry
        h, c = convlstm_step(g_t, h, c, w_h)
        return (h, c), h

    (hf, cf), h_seq = jax.lax.scan(step, (h0, c0), jnp.moveaxis(gates_x, 1, 0))
    return jnp.moveaxis(h_seq, 0, 1), (hf, cf)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Force interpreter mode for pallas_call on CPU."""
    import jax.experimental.pallas as pl

    real_call = pl.pallas_call
    monkeypatch.setattr(
        convlstm_pallas.pl,
        "pallas_call",
        functools.partial(real_call, interpret=True),
    )


def make_inputs(b=2, t=5, h=8, w=16, c=128, seed=0):
    rng = np.random.default_rng(seed)
    gates_x = rng.normal(size=(b, t, h, w, 4 * c)).astype(np.float32) * 0.5
    w_h = rng.normal(size=(3, 3, c, 4 * c)).astype(np.float32) * 0.05
    h0 = rng.normal(size=(b, h, w, c)).astype(np.float32) * 0.1
    c0 = rng.normal(size=(b, h, w, c)).astype(np.float32) * 0.1
    return map(jnp.asarray, (gates_x, w_h, h0, c0))


def test_supported_gate():
    assert pallas_supported(16, 16, 128)
    assert not pallas_supported(16, 16, 96)  # lane misalignment
    assert not pallas_supported(3, 3, 128)  # sublane misalignment


def test_matches_xla_scan():
    gates_x, w_h, h0, c0 = make_inputs()
    with jax.default_matmul_precision("highest"):
        h_seq, (hf, cf) = convlstm_recurrence_pallas(gates_x, w_h, h0, c0)
        ref_seq, (rhf, rcf) = xla_reference(gates_x, w_h, h0, c0)
    np.testing.assert_allclose(np.asarray(h_seq), np.asarray(ref_seq), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(rhf), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(rcf), rtol=1e-4, atol=1e-5)


def test_zero_initial_state():
    gates_x, w_h, _, _ = make_inputs(seed=1)
    h0 = jnp.zeros((2, 8, 16, 128))
    c0 = jnp.zeros_like(h0)
    with jax.default_matmul_precision("highest"):
        h_seq, _ = convlstm_recurrence_pallas(gates_x, w_h, h0, c0)
        ref_seq, _ = xla_reference(gates_x, w_h, h0, c0)
    np.testing.assert_allclose(np.asarray(h_seq), np.asarray(ref_seq), rtol=1e-4, atol=1e-5)


def test_state_carrying_chunks_match():
    """Two chunked invocations == one long invocation (streaming contract)."""
    gates_x, w_h, h0, c0 = make_inputs(t=6, seed=2)
    with jax.default_matmul_precision("highest"):
        full, (hf, cf) = convlstm_recurrence_pallas(gates_x, w_h, h0, c0)
        part1, (h1, c1) = convlstm_recurrence_pallas(gates_x[:, :3], w_h, h0, c0)
        part2, (h2, c2) = convlstm_recurrence_pallas(gates_x[:, 3:], w_h, h1, c1)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([part1, part2], axis=1)),
        np.asarray(full),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(h2), np.asarray(hf), rtol=1e-4, atol=1e-5)


def test_bf16_matches_xla_within_bf16_rounding():
    gates_x, w_h, h0, c0 = make_inputs(t=4, seed=5)
    to16 = lambda a: a.astype(jnp.bfloat16)
    h_seq, _ = convlstm_recurrence_pallas(to16(gates_x), to16(w_h), to16(h0), to16(c0))
    assert h_seq.dtype == jnp.bfloat16
    ref_seq, _ = xla_reference(gates_x, w_h, h0, c0)
    np.testing.assert_allclose(
        np.asarray(h_seq, np.float32), np.asarray(ref_seq), rtol=0.05, atol=0.02
    )


class TestCustomVJP:
    """The backward Pallas kernel vs XLA autodiff of the scan reference."""

    @staticmethod
    def _loss_through(fn, rng):
        r1, r2, r3 = None, None, None

        def loss(gx, wh, h0, c0):
            nonlocal r1, r2, r3
            hs, (hf, cf) = fn(gx, wh, h0, c0)
            if r1 is None:
                r1 = jnp.asarray(rng.normal(size=hs.shape), jnp.float32)
                r2 = jnp.asarray(rng.normal(size=hf.shape), jnp.float32)
                r3 = jnp.asarray(rng.normal(size=cf.shape), jnp.float32)
            return jnp.sum(hs * r1) + jnp.sum(hf * r2) + jnp.sum(cf * r3)

        return loss

    def test_gradients_match_xla(self):
        gates_x, w_h, h0, c0 = make_inputs(b=2, t=4, seed=7)
        rng = np.random.default_rng(8)
        with jax.default_matmul_precision("highest"):
            g_pal = jax.grad(
                self._loss_through(convlstm_recurrence_pallas, rng), argnums=(0, 1, 2, 3)
            )(gates_x, w_h, h0, c0)
            g_xla = jax.grad(
                self._loss_through(xla_reference, np.random.default_rng(8)),
                argnums=(0, 1, 2, 3),
            )(gates_x, w_h, h0, c0)
        for name, a, b in zip(("dgates_x", "dw_h", "dh0", "dc0"), g_pal, g_xla):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
            )

    def test_full_model_training_grads_match(self):
        """backend='pallas' trains identically to backend='xla'."""
        from vad_tpu.models.video_autoencoder import VideoAutoencoder
        from vad_tpu.ops.losses import mse_loss

        x = jnp.asarray(
            np.random.default_rng(9).normal(size=(1, 3, 128, 128, 3)) * 0.5, jnp.float32
        )
        m_xla = VideoAutoencoder(latent_dim=128, lstm_hidden_dim=128, lstm_layers=2)
        variables = m_xla.init(jax.random.key(0), x[:, :2], train=False)
        m_pal = VideoAutoencoder(
            latent_dim=128, lstm_hidden_dim=128, lstm_layers=2, backend="pallas"
        )

        def loss_for(model):
            def f(params):
                recon, _ = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"],
                )
                return mse_loss(recon, x)

            return f

        with jax.default_matmul_precision("highest"):
            g_xla = jax.grad(loss_for(m_xla))(variables["params"])
            g_pal = jax.grad(loss_for(m_pal))(variables["params"])
        flat_x = jax.tree_util.tree_leaves_with_path(g_xla)
        flat_p = jax.tree.leaves(g_pal)
        for (path, a), b in zip(flat_x, flat_p):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6,
                err_msg=jax.tree_util.keystr(path),
            )


def test_unsupported_shape_raises():
    gates_x = jnp.zeros((1, 2, 16, 16, 4 * 96))
    w_h = jnp.zeros((3, 3, 96, 4 * 96))
    h0 = jnp.zeros((1, 16, 16, 96))
    with pytest.raises(ValueError, match="fused ConvLSTM"):
        convlstm_recurrence_pallas(gates_x, w_h, h0, jnp.zeros_like(h0))


def test_model_backend_pallas_matches_xla():
    """Full VideoAutoencoder forward: backend='pallas' == backend='xla'."""
    from vad_tpu.models.video_autoencoder import VideoAutoencoder

    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 3, 128, 128, 3)), jnp.float32
    )
    m_xla = VideoAutoencoder(latent_dim=128, lstm_hidden_dim=128, lstm_layers=2)
    variables = m_xla.init(jax.random.key(0), jnp.zeros((1, 2, 128, 128, 3)), train=False)
    m_pal = VideoAutoencoder(
        latent_dim=128, lstm_hidden_dim=128, lstm_layers=2, backend="pallas"
    )
    with jax.default_matmul_precision("highest"):
        y_xla = m_xla.apply(variables, x, train=False)
        y_pal = m_pal.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla), rtol=1e-4, atol=1e-5)
