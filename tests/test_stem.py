"""The stride-2 stem: TPU-first encoder downsampling (--stem stride2).

The reference downsamples with conv + 2x2 max-pool per encoder block
(reference autoencoder.py:38-79, video_autoencoder.py:182-231).  The
round-3 profiles pinned both measured performance floors to exactly that
choice: block1's forward cost is a full-resolution 256²x32 padded-layout
materialization and the training backward pays a select-and-scatter pool
gradient.  ``--stem stride2`` runs each block's first conv with stride 2
instead — SAME parameter shapes and count (max-pool has no parameters),
same output shapes, but the full-resolution intermediate is never
materialized and the pool backward disappears.

Because the parameter trees are identical, nothing structural can tell
a pool checkpoint from a stride2 one — these tests also pin the guards
that keep the two from being silently interchanged (checkpoint args
record the stem; serving reloads across stems are refused).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vad_tpu.models.autoencoder import ConvAutoencoder
from vad_tpu.models.video_autoencoder import VideoAutoencoder


def _count(v):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))


def test_image_param_tree_identical_across_stems():
    m_p = ConvAutoencoder(stem="pool")
    m_s = ConvAutoencoder(stem="stride2")
    v_p = m_p.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)), train=False)
    v_s = m_s.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)), train=False)
    assert _count(v_p) == _count(v_s) == 1_546_147
    # identical tree structure AND shapes: the stems are indistinguishable
    # structurally (which is why reload needs an explicit stem check)
    assert jax.tree.structure(v_p) == jax.tree.structure(v_s)
    assert jax.tree.map(lambda a, b: a.shape == b.shape, v_p, v_s)


def test_image_shapes_match_pool_variant():
    model = ConvAutoencoder(latent_dim=32, stem="stride2")
    x = jnp.zeros((2, 64, 64, 3))
    v = model.init(jax.random.key(0), x, train=False)
    assert model.apply(v, x, train=False).shape == x.shape
    emap = model.apply(v, x, per_pixel=True,
                       method=ConvAutoencoder.reconstruction_error)
    assert emap.shape == (2, 64, 64)
    # latent-scorer pyramid keeps the same per-block geometry
    pyr = model.apply(v, x, method=ConvAutoencoder.feature_pyramid)
    assert [f.shape for f in pyr] == [
        (2, 32, 32, 32), (2, 16, 16, 64), (2, 8, 8, 128), (2, 4, 4, 32)
    ]


def test_video_param_tree_identical_across_stems():
    m_p = VideoAutoencoder(stem="pool")
    m_s = VideoAutoencoder(stem="stride2")
    x0 = jnp.zeros((1, 2, 64, 64, 3))
    v_p = m_p.init(jax.random.key(0), x0, train=False)
    v_s = m_s.init(jax.random.key(0), x0, train=False)
    assert _count(v_p) == _count(v_s) == 2_709_411
    assert jax.tree.structure(v_p) == jax.tree.structure(v_s)


def test_video_forward_and_stream_step():
    model = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32,
                             lstm_layers=1, stem="stride2")
    x = jnp.zeros((2, 3, 64, 64, 3))
    v = model.init(jax.random.key(0), x[:1, :2], train=False)
    assert model.apply(v, x, train=False).shape == x.shape
    # streaming path carries state across chunks like the pool variant
    from vad_tpu.models.video_autoencoder import ConvLSTM

    states = ConvLSTM.zero_state(1, 1, 4, 4, 32)
    recon, err, scores, new_states = model.apply(
        v, x[:1], states, method=VideoAutoencoder.stream_step
    )
    assert recon.shape == (1, 3, 64, 64, 3)
    assert err.shape == (1, 3, 64, 64)
    assert scores.shape == (1, 3)


def test_stream_step_u8_refuses_stride2():
    """The fused Pallas input kernel computes conv1+max-pool; a stride2
    model must refuse it loudly instead of scoring garbage."""
    model = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32,
                             lstm_layers=1, stem="stride2")
    v = model.init(jax.random.key(0), jnp.zeros((1, 2, 64, 64, 3)), train=False)
    from vad_tpu.models.video_autoencoder import ConvLSTM

    states = ConvLSTM.zero_state(1, 1, 4, 4, 32)
    with pytest.raises(ValueError, match="stride2"):
        model.apply(
            v, jnp.zeros((1, 2, 64, 192), jnp.uint8), states,
            jnp.zeros((1, 1)), jnp.zeros((1,)),
            method=VideoAutoencoder.stream_step_u8,
        )


def test_stride2_downsample_differs_from_pool():
    """Same params, different function: the two stems must NOT agree on
    real data (if they did, the opt-in would be a no-op)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    m_p = ConvAutoencoder(latent_dim=32, stem="pool")
    v = m_p.init(jax.random.key(0), x, train=False)
    m_s = ConvAutoencoder(latent_dim=32, stem="stride2")
    out_p = m_p.apply(v, x, train=False)
    out_s = m_s.apply(v, x, train=False)  # same variables load cleanly
    assert np.abs(np.asarray(out_p) - np.asarray(out_s)).max() > 1e-4


def test_config_round_trips_stem():
    from vad_tpu.core.config import ImageAEConfig, VideoAEConfig

    icfg = ImageAEConfig.from_args({"stem": "stride2"})
    assert icfg.stem == "stride2"
    assert ImageAEConfig.from_args(icfg.to_dict()) == icfg
    # absent key (old/torch-imported checkpoints) defaults to pool
    assert ImageAEConfig.from_args({}).stem == "pool"
    vcfg = VideoAEConfig.from_args({"stem": "stride2"})
    assert vcfg.stem == "stride2"
    assert VideoAEConfig.from_args({}).stem == "pool"


def test_check_served_stem_guard():
    from vad_tpu.utils.precision import check_served_stem

    check_served_stem({}, "pool")  # old checkpoints = pool
    check_served_stem({"stem": "stride2"}, "stride2")
    with pytest.raises(ValueError, match="stem"):
        check_served_stem({"stem": "stride2"}, "pool")
    with pytest.raises(ValueError, match="stem"):
        check_served_stem({}, "stride2")


def test_stem_e2e_image_training(tmp_path):
    """Tiny end-to-end through the real CLI surface: --stem stride2
    trains, records the stem in the checkpoint, and evaluates (the eval
    CLI rebuilds the stride2 model from the checkpoint args)."""
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
        "--batch-size", "8", "--num-workers", "0", "--stem", "stride2",
        "--results-dir", str(tmp_path / "results"),
    ])
    out = train_image(args)
    ckpt_path = out["results_dir"] / "best_model.ckpt"
    ckpt = load_checkpoint(ckpt_path)
    assert ckpt["args"]["stem"] == "stride2"
    eval_args = eval_cli.build_parser().parse_args(["--checkpoint", str(ckpt_path)])
    score = eval_image(eval_args)
    assert 0.0 <= score <= 1.0


def test_stem_e2e_video_training(tmp_path):
    """--stem stride2 through train_video + evaluate_video on the tiny
    synthetic video fixture."""
    import evaluate_video as eval_cli
    import train_video as train_cli
    from vad_tpu.data.synthetic import create_synthetic_video_data
    from vad_tpu.eval.video_eval import evaluate as eval_video
    from vad_tpu.train.video_trainer import train as train_video
    from vad_tpu.utils.checkpoint import load_checkpoint

    data_dir = tmp_path / "data"
    create_synthetic_video_data(
        str(data_dir), "S01", n_train_videos=2, n_test_videos=2,
        frames_per_video=12, image_size=48,
    )
    args = train_cli.build_parser().parse_args([
        "--category", "S01", "--data-dir", str(data_dir),
        "--image-size", "48", "--sequence-length", "4", "--stride", "4",
        "--latent-dim", "16", "--lstm-hidden-dim", "16", "--lstm-layers", "1",
        "--epochs", "1", "--batch-size", "2", "--num-workers", "0",
        "--stem", "stride2", "--results-dir", str(tmp_path / "results"),
    ])
    out = train_video(args)
    ckpt_path = out["results_dir"] / "best_model.ckpt"
    ckpt = load_checkpoint(ckpt_path)
    assert ckpt["args"]["stem"] == "stride2"
    eval_args = eval_cli.build_parser().parse_args([
        "--checkpoint", str(ckpt_path), "--data-dir", str(data_dir),
    ])
    eval_video(eval_args)
    assert (out["results_dir"] / "evaluation" / "results.txt").exists()
