"""Sharding-layout tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vad_tpu.models.video_autoencoder import VideoAutoencoder
from vad_tpu.ops.losses import mse_per_sample
from vad_tpu.parallel.sharding import (
    convlstm_param_shardings,
    get_mesh,
    pad_batch_for_devices,
    padded_batch_size,
    replicate_sharding,
)
from vad_tpu.train.state import create_train_state
from vad_tpu.train.steps import make_train_step


def test_mesh_shapes():
    m1 = get_mesh(model_parallel=1)
    m2 = get_mesh(model_parallel=2)
    assert (m1.shape["data"], m1.shape["model"]) == (8, 1)
    assert (m2.shape["data"], m2.shape["model"]) == (4, 2)
    with pytest.raises(ValueError):
        get_mesh(model_parallel=3)


def test_padded_batch_size():
    mesh = get_mesh()
    assert padded_batch_size(8, mesh) == 8
    assert padded_batch_size(5, mesh) == 8
    assert padded_batch_size(9, mesh) == 16


def test_pad_batch_repeats_last():
    arrays = {"x": np.arange(6).reshape(3, 2).astype(np.float32), "meta": "keep"}
    padded, n = pad_batch_for_devices(arrays, 5)
    assert n == 3
    assert padded["x"].shape == (5, 2)
    np.testing.assert_array_equal(padded["x"][3], padded["x"][2])
    assert padded["meta"] == "keep"
    with pytest.raises(ValueError):
        pad_batch_for_devices({"x": np.zeros((6, 2))}, 5)


def test_convlstm_param_shardings_target_gate_kernels():
    mesh = get_mesh(model_parallel=2)
    model = VideoAutoencoder(latent_dim=128, lstm_hidden_dim=128, lstm_layers=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, 32, 32, 3)), train=False)
    shardings = convlstm_param_shardings(variables["params"], mesh)

    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded = [
        (path, s) for path, s in flat if s.spec != P()
    ]
    # exactly the two ConvLSTM layer kernels + biases are model-sharded
    names = ["/".join(getattr(p, "key", str(p)) for p in path) for path, _ in sharded]
    assert len(sharded) == 4
    assert all("ConvLSTMLayer" in n for n in names)


def test_tp_matches_dp_only_loss():
    """Training step loss identical under (8,1) and (4,2) meshes."""
    model = VideoAutoencoder(latent_dim=128, lstm_hidden_dim=128, lstm_layers=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, 32, 32, 3)), train=False)
    x = np.random.default_rng(0).normal(size=(8, 2, 32, 32, 3)).astype(np.float32) * 0.5

    losses = []
    for mp in (1, 2):
        mesh = get_mesh(model_parallel=mp)
        # fresh host copies: the donated train step would otherwise delete
        # buffers aliased with `variables` between iterations
        fresh = jax.tree.map(np.array, variables)
        state = create_train_state(model, fresh, 1e-4)
        state = state.replace(
            params=jax.tree.map(
                jax.device_put, state.params, convlstm_param_shardings(state.params, mesh)
            ),
            batch_stats=jax.device_put(state.batch_stats, replicate_sharding(mesh)),
            opt_state=jax.device_put(state.opt_state, replicate_sharding(mesh)),
        )
        xd = jax.device_put(x, NamedSharding(mesh, P("data")))
        step = make_train_step(mse_per_sample, mesh=None)
        _, loss = step(state, xd, jnp.asarray(8))
        losses.append(float(loss))
    assert np.isclose(losses[0], losses[1], rtol=1e-5)
