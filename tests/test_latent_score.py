"""Latent-distance scorer (eval/latent_score.py): unit + e2e coverage.

Beyond-reference capability — the reference scores only by
reconstruction error (evaluate.py:60-74); `--scorer latent` fits
per-position Gaussians over encoder features and scores by Mahalanobis
distance.  Unit tests pin the math on a tiny backbone; e2e tests drive
the real CLIs on the synthetic fixtures.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vad_tpu.eval import latent_score as ls
from vad_tpu.models.autoencoder import ConvAutoencoder


@pytest.fixture(scope="module")
def tiny_backbone():
    model = ConvAutoencoder(latent_dim=32)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x0, train=False)

    def pyramid_fn(v, x):
        return model.apply(v, x, method=ConvAutoencoder.feature_pyramid)

    return model, variables, pyramid_fn


def _normal_batches(rng, n=6, b=4, size=64):
    for _ in range(n):
        base = np.full((b, size, size, 3), 0.1, np.float32)
        yield base + rng.normal(scale=0.05, size=base.shape).astype(np.float32)


def test_pyramid_shapes(tiny_backbone):
    _, variables, pyramid_fn = tiny_backbone
    feats = pyramid_fn(variables, jnp.zeros((2, 64, 64, 3)))
    assert [f.shape for f in feats] == [
        (2, 32, 32, 32), (2, 16, 16, 64), (2, 8, 8, 128), (2, 4, 4, 32),
    ]


def test_resample_paths():
    f = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    assert ls._resample(f, 8) is f  # identity
    down = ls._resample(f, 4)  # exact 2x2 average pool
    assert down.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(
        np.asarray(down[0, 0, 0, 0]),
        np.asarray(f[0, :2, :2, 0]).mean(),
        rtol=1e-6,
    )
    up = ls._resample(f, 16)  # nearest repeat
    assert up.shape == (2, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(up[0, 0, 0]), np.asarray(up[0, 1, 1]))
    # mass preserved both ways
    np.testing.assert_allclose(float(down.mean()), float(f.mean()), rtol=1e-6)
    np.testing.assert_allclose(float(up.mean()), float(f.mean()), rtol=1e-6)


def test_fit_and_separation(tiny_backbone):
    """Anomalous patches score far above normal ones, maps localize."""
    _, variables, pyramid_fn = tiny_backbone
    rng = np.random.default_rng(1)
    stats = ls.fit_latent_stats(
        pyramid_fn, variables, _normal_batches(rng), proj_dim=32, seed=0
    )
    assert stats.grid == 16 and stats.dim == 32 and stats.n_fit == 24
    assert bool(jnp.isfinite(stats.mean).all())
    assert bool(jnp.isfinite(stats.precision).all())

    step = jax.jit(ls.make_distance_step(pyramid_fn, stats))
    xn = np.full((4, 64, 64, 3), 0.1, np.float32)
    xn += rng.normal(scale=0.05, size=xn.shape).astype(np.float32)
    xa = xn.copy()
    xa[:, 16:40, 16:40, :] = 0.9  # bright square defect
    mn = np.asarray(step(variables, jnp.asarray(xn)))
    ma = np.asarray(step(variables, jnp.asarray(xa)))
    assert mn.shape == (4, 16, 16)
    assert ma.mean() > mn.mean() * 1.5
    # the map localizes: defect region scores above the background
    defect = ma[:, 5:9, 5:9].mean()
    background = ma[:, 12:, 12:].mean()
    assert defect > background
    # upsampling for pixel metrics
    up = ls.upsample_maps(jnp.asarray(ma), 64)
    assert up.shape == (4, 64, 64)


def test_fit_deterministic_and_roundtrip(tiny_backbone, tmp_path):
    _, variables, pyramid_fn = tiny_backbone
    s1 = ls.fit_latent_stats(
        pyramid_fn, variables, _normal_batches(np.random.default_rng(2)),
        proj_dim=16, seed=7,
    )
    s2 = ls.fit_latent_stats(
        pyramid_fn, variables, _normal_batches(np.random.default_rng(2)),
        proj_dim=16, seed=7,
    )
    np.testing.assert_array_equal(np.asarray(s1.proj), np.asarray(s2.proj))
    np.testing.assert_allclose(
        np.asarray(s1.mean), np.asarray(s2.mean), rtol=1e-5, atol=1e-6
    )
    path = tmp_path / "stats.npz"
    ls.save_stats(path, s1)
    s3 = ls.load_stats(path)
    assert (s3.grid, s3.layers, s3.n_fit) == (s1.grid, s1.layers, s1.n_fit)
    np.testing.assert_allclose(np.asarray(s3.mean), np.asarray(s1.mean))
    np.testing.assert_allclose(np.asarray(s3.precision), np.asarray(s1.precision))


def test_no_projection_when_dim_large(tiny_backbone):
    """proj_dim >= channel count -> identity embedding (no projection)."""
    _, variables, pyramid_fn = tiny_backbone
    stats = ls.fit_latent_stats(
        pyramid_fn, variables, _normal_batches(np.random.default_rng(3), n=2),
        proj_dim=10_000,
    )
    assert stats.proj is None
    assert stats.dim == 32 + 64 + 128  # concatenated default layers


def test_video_pyramid_and_scoring():
    """VideoAutoencoder.feature_pyramid handles frames and windows; the
    distance step scores flattened window frames."""
    from vad_tpu.models.video_autoencoder import VideoAutoencoder

    model = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32, lstm_layers=1)
    x0 = jnp.zeros((1, 2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x0, train=False)

    def pyramid_fn(v, frames):
        return model.apply(v, frames, method=VideoAutoencoder.feature_pyramid)

    # 5D input keeps [B, T] leading dims
    feats5 = pyramid_fn(variables, jnp.zeros((2, 3, 64, 64, 3)))
    assert feats5[0].shape == (2, 3, 32, 32, 32)
    # 4D frames drive the scorer
    rng = np.random.default_rng(4)
    stats = ls.fit_latent_stats(
        pyramid_fn, variables,
        (rng.normal(scale=0.1, size=(6, 64, 64, 3)).astype(np.float32)
         for _ in range(3)),
        proj_dim=24,
    )
    step = jax.jit(ls.make_distance_step(pyramid_fn, stats))
    win = rng.normal(scale=0.1, size=(2, 3, 64, 64, 3)).astype(np.float32)
    maps = step(variables, jnp.asarray(win.reshape(-1, 64, 64, 3)))
    frame_scores = np.asarray(jnp.mean(maps, axis=(1, 2))).reshape(2, 3)
    assert np.all(np.isfinite(frame_scores))


def test_fit_tail_padding_exact(tiny_backbone):
    """Tail batches are padded to the leading batch size (one compiled
    shape) with masked accumulation — statistics match exact batching."""
    _, variables, pyramid_fn = tiny_backbone
    rng = np.random.default_rng(6)
    imgs = (0.1 + rng.normal(scale=0.05, size=(6, 64, 64, 3))).astype(np.float32)
    a = ls.fit_latent_stats(pyramid_fn, variables, iter([imgs]), proj_dim=16, seed=1)
    b = ls.fit_latent_stats(
        pyramid_fn, variables, iter([imgs[:4], imgs[4:]]), proj_dim=16, seed=1
    )
    assert a.n_fit == b.n_fit == 6
    np.testing.assert_allclose(
        np.asarray(a.mean), np.asarray(b.mean), rtol=1e-4, atol=1e-5
    )
    # compare the observable (distances), not raw precision entries: the
    # inverse of a 6-sample covariance amplifies f32 noise element-wise
    step_a = jax.jit(ls.make_distance_step(pyramid_fn, a))
    step_b = jax.jit(ls.make_distance_step(pyramid_fn, b))
    probe = (0.1 + np.random.default_rng(7).normal(
        scale=0.08, size=(3, 64, 64, 3))).astype(np.float32)
    da = np.asarray(step_a(variables, jnp.asarray(probe)))
    db = np.asarray(step_b(variables, jnp.asarray(probe)))
    np.testing.assert_allclose(da, db, rtol=2e-2, atol=1e-2)


def test_temporal_features_expanding_pyramid():
    """A pyramid_fn that expands samples (windows -> frames via
    VideoAutoencoder.temporal_features) fits and scores correctly:
    n_fit counts embeddings and distance maps size from the embedding."""
    from vad_tpu.models.video_autoencoder import VideoAutoencoder

    model = VideoAutoencoder(latent_dim=16, lstm_hidden_dim=16, lstm_layers=1)
    x0 = jnp.zeros((1, 2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x0, train=False)

    def pyramid_fn(v, windows):
        (h_seq,) = model.apply(
            v, windows, method=VideoAutoencoder.temporal_features
        )
        return (h_seq.reshape(-1, *h_seq.shape[2:]),)

    rng = np.random.default_rng(5)
    windows = [
        rng.normal(scale=0.1, size=(3, 4, 32, 32, 3)).astype(np.float32)
        for _ in range(2)
    ]
    stats = ls.fit_latent_stats(
        pyramid_fn, variables, iter(windows), layers=(0,), proj_dim=8
    )
    assert stats.n_fit == 2 * 3 * 4  # frames, not windows
    step = jax.jit(ls.make_distance_step(pyramid_fn, stats))
    maps = step(variables, jnp.asarray(windows[0]))
    assert maps.shape == (3 * 4, stats.grid, stats.grid)  # per frame
    assert bool(jnp.isfinite(maps).all())


def test_cli_flags_parse():
    import evaluate as eval_cli
    import evaluate_video as ev_cli

    a = eval_cli.build_parser().parse_args(
        ["--checkpoint", "x", "--scorer", "latent", "--latent-proj-dim", "64"]
    )
    assert a.scorer == "latent" and a.latent_proj_dim == 64
    v = ev_cli.build_parser().parse_args(
        ["--checkpoint", "x", "--scorer", "latent"]
    )
    assert v.scorer == "latent"


@pytest.fixture(scope="module")
def latent_image_run(tmp_path_factory):
    """Tiny trained image model + data for the e2e latent evaluation."""
    from vad_tpu.data.synthetic import create_synthetic_image_data
    import train as train_cli
    from vad_tpu.train.image_trainer import train

    root = tmp_path_factory.mktemp("latent_e2e")
    data_dir = root / "data"
    create_synthetic_image_data(
        str(data_dir), "synthetic", n_train=12, n_test_good=5, n_test_defect=6,
        image_size=64,
    )
    args = train_cli.build_parser().parse_args(
        [
            "--category", "synthetic", "--data-dir", str(data_dir),
            "--image-size", "64", "--latent-dim", "32", "--epochs", "2",
            "--batch-size", "6", "--num-workers", "2",
            "--results-dir", str(root / "results"),
        ]
    )
    out = train(args)
    return {"data_dir": data_dir, "results_dir": out["results_dir"]}


def test_evaluate_cli_latent(latent_image_run):
    """`evaluate.py --scorer latent` end to end: artifacts + finite AUROC."""
    import evaluate as eval_cli
    from vad_tpu.eval.image_eval import evaluate

    ckpt = str(latent_image_run["results_dir"] / "best_model.ckpt")
    score = evaluate(
        eval_cli.build_parser().parse_args(
            ["--checkpoint", ckpt, "--scorer", "latent", "--latent-proj-dim", "48"]
        )
    )
    assert 0.0 <= score <= 1.0
    out = latent_image_run["results_dir"] / "evaluation"
    assert (out / "latent_stats.npz").exists()
    text = (out / "results.txt").read_text()
    assert text.startswith("AUROC: ")
    assert "Scorer: latent" in text
    stats = ls.load_stats(out / "latent_stats.npz")
    assert stats.dim == 48

    # --latent-stats reuses the persisted fit (identical AUROC, no refit)
    score2 = evaluate(
        eval_cli.build_parser().parse_args(
            [
                "--checkpoint", ckpt, "--scorer", "latent",
                "--latent-stats", str(out / "latent_stats.npz"),
            ]
        )
    )
    assert score2 == score


def test_evaluate_video_cli_latent(tmp_path):
    """`evaluate_video.py --scorer latent` end to end on the video fixture."""
    from vad_tpu.data.synthetic import create_synthetic_video_data
    import train_video as tv_cli
    import evaluate_video as ev_cli
    from vad_tpu.train.video_trainer import train
    from vad_tpu.eval.video_eval import evaluate

    data_dir = tmp_path / "data"
    create_synthetic_video_data(
        str(data_dir), "S01", n_train_videos=2, n_test_videos=2,
        frames_per_video=16, image_size=64,
    )
    targs = tv_cli.build_parser().parse_args(
        [
            "--category", "S01", "--data-dir", str(data_dir),
            "--image-size", "64", "--sequence-length", "8", "--stride", "8",
            "--latent-dim", "32", "--lstm-hidden-dim", "32",
            "--lstm-layers", "1", "--epochs", "1", "--batch-size", "2",
            "--num-workers", "2", "--results-dir", str(tmp_path / "results"),
        ]
    )
    out = train(targs)
    eargs = ev_cli.build_parser().parse_args(
        [
            "--checkpoint", str(out["results_dir"] / "best_model.ckpt"),
            "--data-dir", str(data_dir), "--scorer", "latent",
            "--latent-proj-dim", "32", "--batch-size", "2",
        ]
    )
    a = evaluate(eargs)
    assert 0.0 <= a <= 1.0
    eval_dir = out["results_dir"] / "evaluation"
    assert (eval_dir / "latent_stats.npz").exists()
    assert "Scorer: latent" in (eval_dir / "results.txt").read_text()
    # visualizations came from the latent maps path (review finding:
    # artifacts must match the metrics in results.txt)
    assert list(eval_dir.glob("visualization_*.png"))


def test_latent_rejects_streaming_modes(tmp_path):
    """--scorer latent + --video fails loudly instead of silently scoring
    by reconstruction error (CLI-level guard)."""
    import subprocess
    import sys

    proc = subprocess.run(
        [
            sys.executable, "evaluate_video.py", "--checkpoint", "x",
            "--video", "clip.mp4", "--scorer", "latent",
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert proc.returncode != 0
    assert "dataset evaluation only" in proc.stderr
