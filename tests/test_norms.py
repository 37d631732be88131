"""GroupNorm option: per-sample statistics immune to batch padding.

The reference hard-codes BatchNorm; with datasets smaller than one batch
our static-shape padding duplicates samples into train-mode batch
statistics (the loss is masked, the normalizer cannot be — documented
caveat in train/steps.py).  ``--norm group`` closes it: normalization
becomes per-sample, so padded rows cannot perturb real rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vad_tpu.models.autoencoder import ConvAutoencoder
from vad_tpu.models.video_autoencoder import VideoAutoencoder


def test_param_counts_unchanged_by_norm_kind():
    m_b = ConvAutoencoder(norm="batch")
    m_g = ConvAutoencoder(norm="group")
    v_b = m_b.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)), train=False)
    v_g = m_g.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)), train=False)
    count = lambda v: sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert count(v_b) == count(v_g) == 1_546_147
    assert "batch_stats" in v_b and "batch_stats" not in v_g


def test_groupnorm_train_mode_ignores_padded_rows():
    """Train-mode forward of [real; padded-duplicates] must equal the
    forward of the real rows alone on those rows — exactly what BatchNorm
    violates and GroupNorm guarantees."""
    rng = np.random.default_rng(0)
    model = ConvAutoencoder(norm="group")
    real = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), real, train=False)

    padded = jnp.concatenate([real, real[:1], real[:1]], axis=0)  # B=4 padded
    out_real = model.apply(variables, real, train=True)
    out_pad = model.apply(variables, padded, train=True)
    np.testing.assert_allclose(
        np.asarray(out_pad[:2]), np.asarray(out_real), rtol=1e-5, atol=1e-5
    )

    # BatchNorm, by contrast, couples rows (sanity check of the premise)
    model_b = ConvAutoencoder(norm="batch")
    vb = model_b.init(jax.random.key(0), real, train=False)
    ob_real, _ = model_b.apply(vb, real, train=True, mutable=["batch_stats"])
    ob_pad, _ = model_b.apply(vb, padded, train=True, mutable=["batch_stats"])
    assert np.abs(np.asarray(ob_pad[:2]) - np.asarray(ob_real)).max() > 1e-6


def test_video_groupnorm_forward_and_stream():
    model = VideoAutoencoder(norm="group")
    v = model.init(jax.random.key(0), jnp.zeros((1, 2, 64, 64, 3)), train=False)
    assert "batch_stats" not in v
    count = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    x = jnp.zeros((2, 3, 64, 64, 3))
    y = model.apply(v, x, train=False)
    assert y.shape == x.shape
    # param count matches the BatchNorm build (affine per channel both ways)
    vb = VideoAutoencoder(norm="batch").init(
        jax.random.key(0), jnp.zeros((1, 2, 64, 64, 3)), train=False
    )
    count_b = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vb["params"]))
    assert count == count_b


def test_video_groupnorm_train_step():
    """One real jitted train step on the video model with GroupNorm: the
    empty batch_stats collection must flow through make_train_step's
    mutable=['batch_stats'] machinery unchanged."""
    from vad_tpu.ops.losses import mse_per_sample
    from vad_tpu.train.state import create_train_state
    from vad_tpu.train.steps import make_train_step

    model = VideoAutoencoder(norm="group")
    x = np.random.default_rng(0).normal(size=(2, 2, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, 32, 32, 3)), train=False)
    state = create_train_state(model, variables, learning_rate=1e-4)
    assert state.batch_stats == {}
    before = jax.tree.map(np.asarray, state.params)  # state is donated below
    step = make_train_step(mse_per_sample)
    state2, loss = step(state, jnp.asarray(x), jnp.asarray(2))
    assert np.isfinite(float(loss))
    assert state2.batch_stats == {}
    # params actually moved
    d = jax.tree.map(lambda a, b: float(np.abs(np.asarray(b) - a).max()),
                     before, state2.params)
    assert max(jax.tree.leaves(d)) > 0


def test_groupnorm_e2e_image_training(tmp_path):
    """Tiny end-to-end: --norm group trains, checkpoints, and evaluates
    through the real CLI arg surface."""
    import evaluate as eval_cli
    import train as train_cli
    from vad_tpu.data.synthetic import create_synthetic_image_data
    from vad_tpu.eval.image_eval import evaluate as eval_image
    from vad_tpu.train.image_trainer import train as train_image
    from vad_tpu.utils.checkpoint import load_checkpoint

    data_dir = tmp_path / "data"
    create_synthetic_image_data(
        str(data_dir), "synthetic", n_train=8, n_test_good=3, n_test_defect=4,
        image_size=64,
    )
    args = train_cli.build_parser().parse_args([
        "--category", "synthetic", "--data-dir", str(data_dir),
        "--image-size", "64", "--latent-dim", "32", "--epochs", "2",
        "--batch-size", "8", "--num-workers", "0", "--norm", "group",
        "--results-dir", str(tmp_path / "results"),
    ])
    out = train_image(args)
    ckpt_path = out["results_dir"] / "best_model.ckpt"
    assert ckpt_path.exists()
    ckpt = load_checkpoint(ckpt_path)
    assert ckpt["args"]["norm"] == "group"
    assert not ckpt.get("batch_stats")  # no running stats with GroupNorm
    eval_args = eval_cli.build_parser().parse_args(["--checkpoint", str(ckpt_path)])
    score = eval_image(eval_args)
    assert 0.0 <= score <= 1.0
