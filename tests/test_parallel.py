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
    opt_state_shardings,
    pad_batch_for_devices,
    padded_batch_size,
    replicate_sharding,
    train_state_shardings,
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


def test_opt_state_shardings_mirror_params():
    """Adam moments get exactly the param shardings; scalars replicated."""
    mesh = get_mesh(model_parallel=2)
    model = VideoAutoencoder(latent_dim=128, lstm_hidden_dim=128, lstm_layers=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, 32, 32, 3)), train=False)
    state = create_train_state(model, variables, 1e-4)

    param_sh = convlstm_param_shardings(state.params, mesh)
    opt_sh = opt_state_shardings(state.opt_state, state.params, mesh)

    # structure matches the opt_state leaf-for-leaf (device_put-able pairwise)
    assert jax.tree.structure(opt_sh) == jax.tree.structure(state.opt_state)

    # exactly two params-structured subtrees (mu, nu), each carrying the
    # param shardings verbatim
    pdef = jax.tree.structure(state.params)
    matches = []

    def collect(node):
        if jax.tree.structure(node) == pdef:
            matches.append(node)
            return True
        return False

    jax.tree.map(lambda n: n, opt_sh, is_leaf=collect)
    assert len(matches) == 2
    n_param_sharded = sum(int(s.spec != P()) for s in jax.tree.leaves(param_sh))
    assert n_param_sharded == 4
    for m in matches:
        assert jax.tree.all(jax.tree.map(lambda a, b: a == b, m, param_sh))

    # everything outside the moments (count, hyperparams) is replicated
    total_sharded = sum(int(s.spec != P()) for s in jax.tree.leaves(opt_sh))
    assert total_sharded == 2 * n_param_sharded


def test_opt_state_moments_pinned_by_type_not_structure():
    """A chain carrying a params-STRUCTURED but scalar-leaved extra state
    must not receive param shardings (bare treedef equality would
    mis-shard it); the true Adam moments still get them via the
    ScaleByAdamState type match."""
    import optax

    mesh = get_mesh(model_parallel=2)
    model = VideoAutoencoder(latent_dim=128, lstm_hidden_dim=128, lstm_layers=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, 32, 32, 3)), train=False)
    params = variables["params"]

    def scale_init(p):
        # params-structured tree of SCALARS: same treedef, wrong shapes
        return jax.tree.map(lambda _: jnp.asarray(1.0), p)

    extra = optax.GradientTransformation(scale_init, lambda u, s, p=None: (u, s))
    tx = optax.chain(extra, optax.scale_by_adam(), optax.scale(-1e-4))
    opt_state = tx.init(params)

    opt_sh = opt_state_shardings(opt_state, params, mesh)
    assert jax.tree.structure(opt_sh) == jax.tree.structure(opt_state)

    # the scalar tree (chain position 0) is fully replicated
    scalar_tree_sh = opt_sh[0]
    assert all(s.spec == P() for s in jax.tree.leaves(scalar_tree_sh))
    # Adam's mu/nu (chain position 1) carry the param shardings verbatim
    param_sh = convlstm_param_shardings(params, mesh)
    adam_sh = opt_sh[1]
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, adam_sh.mu, param_sh))
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, adam_sh.nu, param_sh))
    n_param_sharded = sum(int(s.spec != P()) for s in jax.tree.leaves(param_sh))
    total_sharded = sum(int(s.spec != P()) for s in jax.tree.leaves(opt_sh))
    assert n_param_sharded == 4 and total_sharded == 2 * n_param_sharded


def test_tp_matches_dp_only_loss_multi_step():
    """Per-step losses identical under (8,1) and (4,2) meshes across 3 Adam
    steps, with the opt state sharded like the params under tp."""
    model = VideoAutoencoder(latent_dim=128, lstm_hidden_dim=128, lstm_layers=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, 32, 32, 3)), train=False)
    rng = np.random.default_rng(0)
    batches = [
        rng.normal(size=(8, 2, 32, 32, 3)).astype(np.float32) * 0.5 for _ in range(3)
    ]

    losses = []
    moment_specs = []
    for mp in (1, 2):
        mesh = get_mesh(model_parallel=mp)
        # fresh host copies: the donated train step would otherwise delete
        # buffers aliased with `variables` between iterations
        fresh = jax.tree.map(np.array, variables)
        state = create_train_state(model, fresh, 1e-4)
        opt_sh = opt_state_shardings(state.opt_state, state.params, mesh)
        state = state.replace(
            params=jax.tree.map(
                jax.device_put, state.params, convlstm_param_shardings(state.params, mesh)
            ),
            batch_stats=jax.device_put(state.batch_stats, replicate_sharding(mesh)),
            opt_state=jax.tree.map(jax.device_put, state.opt_state, opt_sh),
        )
        step = make_train_step(
            mse_per_sample,
            mesh=mesh,
            state_shardings=train_state_shardings(state, mesh),
        )
        per_step = []
        for x in batches:
            xd = jax.device_put(x, NamedSharding(mesh, P("data")))
            state, loss = step(state, xd, jnp.asarray(8))
            per_step.append(float(loss))
        losses.append(per_step)
        # after stepping, the Adam moments must still carry the tp sharding
        moment_specs.append(
            sorted(
                str(leaf.sharding.spec)
                for leaf in jax.tree.leaves(state.opt_state)
                if hasattr(leaf, "sharding")
                and getattr(leaf.sharding, "spec", P()) != P()
            )
        )
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-4)
    assert len(moment_specs[1]) == 8, moment_specs[1]  # 4 tensors x (mu, nu)
    assert moment_specs[0] == []  # dp-only mesh: nothing model-sharded


def test_bf16_under_tensor_parallel():
    """--precision bf16 composes with model_parallel=2: the bf16 cast happens
    inside the objective AFTER the tp shardings are pinned, so gate-kernel
    shards cast locally and the loss tracks the f32 tp run to bf16 tolerance;
    master params/moments stay f32 and keep their tp placement."""
    model = VideoAutoencoder(latent_dim=128, lstm_hidden_dim=128, lstm_layers=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, 32, 32, 3)), train=False)
    rng = np.random.default_rng(1)
    batches = [
        rng.normal(size=(8, 2, 32, 32, 3)).astype(np.float32) * 0.5 for _ in range(2)
    ]

    losses = {}
    for compute_dtype in (None, jnp.bfloat16):
        mesh = get_mesh(model_parallel=2)
        fresh = jax.tree.map(np.array, variables)
        state = create_train_state(model, fresh, 1e-4)
        sh = train_state_shardings(state, mesh)
        state = state.replace(
            params=jax.tree.map(jax.device_put, state.params, sh.params),
            batch_stats=jax.device_put(state.batch_stats, replicate_sharding(mesh)),
            opt_state=jax.tree.map(jax.device_put, state.opt_state, sh.opt_state),
        )
        step = make_train_step(
            mse_per_sample, mesh=mesh, state_shardings=sh,
            compute_dtype=compute_dtype,
        )
        per_step = []
        for x in batches:
            xd = jax.device_put(x, NamedSharding(mesh, P("data")))
            state, loss = step(state, xd, jnp.asarray(8))
            per_step.append(float(loss))
        losses[compute_dtype] = per_step

        if compute_dtype is not None:
            for leaf in jax.tree.leaves((state.params, state.opt_state)):
                if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
                    assert leaf.dtype == jnp.float32
            tp_sharded = [
                leaf for leaf in jax.tree.leaves(state.opt_state)
                if hasattr(leaf, "sharding")
                and getattr(leaf.sharding, "spec", P()) != P()
            ]
            assert len(tp_sharded) == 8  # 4 gate tensors x (mu, nu)

    np.testing.assert_allclose(
        losses[None], losses[jnp.bfloat16], rtol=0.02
    )
