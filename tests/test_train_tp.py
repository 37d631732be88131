"""Trainer ENTRY POINTS under tensor parallelism on the virtual mesh.

`python train.py` / `train_video.py` themselves must be the distributed
program (SURVEY §5.8): these tests run the real `train()` functions —
not just `make_train_step` — with --model-parallel 2 on the 8-virtual-
device CPU mesh and assert the training trajectory and checkpoint
selection behavior are identical to pure data parallelism.  Extra mesh
shapes (model_parallel=4, an odd data axis) are covered at the step
level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _image_args(data_dir, results_dir, model_parallel, epochs=2):
    import train as train_cli

    return train_cli.build_parser().parse_args([
        "--category", "synthetic",
        "--data-dir", str(data_dir),
        "--image-size", "64",
        "--latent-dim", "64",
        "--epochs", str(epochs),
        "--batch-size", "8",
        "--num-workers", "2",
        "--results-dir", str(results_dir),
        "--model-parallel", str(model_parallel),
    ])


def test_image_trainer_entry_tp_matches_dp(synthetic_image_root, tmp_path):
    """image_trainer.train() loss trajectory: model_parallel=2 == dp-only."""
    from vad_tpu.train.image_trainer import train

    hist = {}
    for mp in (1, 2):
        args = _image_args(synthetic_image_root, tmp_path / f"mp{mp}", mp)
        hist[mp] = train(args)["history"]
    # tolerance: the (8,1) and (4,2) meshes reduce gradients in different
    # orders (psum shard count differs), and the f32 drift compounds
    # through Adam + BN running stats across epochs — ~1e-3 relative
    # after 2 epochs is partitioning noise, not a logic difference
    np.testing.assert_allclose(hist[1]["train_loss"], hist[2]["train_loss"], rtol=3e-3)
    np.testing.assert_allclose(hist[1]["val_loss"], hist[2]["val_loss"], rtol=3e-3)
    np.testing.assert_allclose(hist[1]["anomaly_err"], hist[2]["anomaly_err"], rtol=3e-3)


def _video_args(data_dir, results_dir, model_parallel, epochs=2):
    import train_video as tv_cli

    return tv_cli.build_parser().parse_args([
        "--category", "S01",
        "--data-dir", str(data_dir),
        "--image-size", "64",
        "--sequence-length", "8",
        "--stride", "4",
        "--latent-dim", "32",
        "--lstm-hidden-dim", "32",
        "--epochs", str(epochs),
        # batch 8 == the dp mesh's data axis: pad_to is then 8 on BOTH
        # meshes, so train-mode BN sees identical batch statistics (with
        # batch 4 the dp mesh pads 4 duplicate rows into BN while the
        # (4,2) mesh pads none — a real trajectory difference, not noise)
        "--batch-size", "8",
        "--num-workers", "2",
        "--results-dir", str(results_dir),
        "--model-parallel", str(model_parallel),
    ])


def test_video_trainer_entry_tp_matches_dp(synthetic_video_root, tmp_path):
    """video_trainer.train() under model_parallel=2 for 2 epochs: identical
    separation trajectory AND identical best-checkpoint selection."""
    from vad_tpu.train.video_trainer import train
    from vad_tpu.utils.checkpoint import load_checkpoint

    out = {}
    for mp in (1, 2):
        args = _video_args(synthetic_video_root, tmp_path / f"vmp{mp}", mp)
        out[mp] = train(args)
    h1, h2 = out[1]["history"], out[2]["history"]
    # rtol: see test_image_trainer_entry_tp_matches_dp — cross-mesh
    # reduction-order drift compounds over epochs
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"], rtol=3e-3)
    np.testing.assert_allclose(h1["separation"], h2["separation"], rtol=3e-3)
    assert out[1]["best_epoch"] == out[2]["best_epoch"]
    # the saved best checkpoints record the same selection decision and
    # carry weights that agree numerically
    c1 = load_checkpoint(out[1]["results_dir"] / "best_model.ckpt")
    c2 = load_checkpoint(out[2]["results_dir"] / "best_model.ckpt")
    assert c1["epoch"] == c2["epoch"]
    np.testing.assert_allclose(c1["separation"], c2["separation"], rtol=3e-3)
    # atol dominates near-zero weights (Adam's early steps are ~sign
    # updates, so cross-mesh rounding walks tiny weights by O(lr))
    for a, b in zip(jax.tree.leaves(c1["params"]), jax.tree.leaves(c2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-3)


@pytest.mark.parametrize(
    "n_devices,mp,batch",
    [(8, 4, 8), (6, 2, 6)],  # model_parallel=4; odd (3-wide) data axis
    ids=["mp4", "odd-data-axis"],
)
def test_train_step_extra_mesh_shapes(n_devices, mp, batch):
    """Step-level loss parity on mesh shapes beyond (8,1)/(4,2)."""
    from vad_tpu.models.video_autoencoder import VideoAutoencoder
    from vad_tpu.ops.losses import mse_per_sample
    from vad_tpu.parallel.multihost import put_global_batch
    from vad_tpu.parallel.sharding import get_mesh, train_state_shardings
    from vad_tpu.train.state import create_train_state
    from vad_tpu.train.steps import make_train_step

    model = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32, lstm_layers=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, 32, 32, 3)), train=False)
    rng = np.random.default_rng(0)
    batches = [
        rng.normal(size=(batch, 2, 32, 32, 3)).astype(np.float32) * 0.5
        for _ in range(2)
    ]

    losses = []
    for model_parallel in (1, mp):
        mesh = get_mesh(jax.devices()[:n_devices], model_parallel=model_parallel)
        fresh = jax.tree.map(np.array, variables)
        state = create_train_state(model, fresh, 1e-4)
        state_sh = train_state_shardings(state, mesh)
        state = jax.tree.map(jax.device_put, state, state_sh)
        step = make_train_step(mse_per_sample, mesh=mesh, state_shardings=state_sh)
        per_step = []
        for x in batches:
            xg = put_global_batch(mesh, {"x": x})["x"]
            state, loss = step(state, xg, jnp.asarray(batch))
            per_step.append(float(loss))
        losses.append(per_step)
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-4)
