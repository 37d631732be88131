"""End-to-end image pipeline: train CLI -> checkpoint -> evaluate CLI.

The synthetic dataset is the integration fixture (same role as reference
download_data.py:85-184 / SURVEY §4).  Runs tiny (64x64, few epochs) on
the 8-virtual-device CPU mesh.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from vad_tpu.data.synthetic import create_synthetic_image_data

    import train as train_cli
    from vad_tpu.train.image_trainer import train

    root = tmp_path_factory.mktemp("e2e")
    data_dir = root / "data"
    create_synthetic_image_data(
        str(data_dir), "synthetic", n_train=16, n_test_good=6, n_test_defect=8,
        image_size=64,
    )
    args = train_cli.build_parser().parse_args(
        [
            "--category", "synthetic",
            "--data-dir", str(data_dir),
            "--image-size", "64",
            "--latent-dim", "64",
            "--epochs", "4",
            "--batch-size", "8",
            "--num-workers", "2",
            "--results-dir", str(root / "results"),
        ]
    )
    out = train(args)
    return {"data_dir": data_dir, "results_dir": out["results_dir"], "history": out["history"]}


def test_training_artifacts(trained_run):
    rd = trained_run["results_dir"]
    assert (rd / "best_model.ckpt").exists()
    assert (rd / "final_model.ckpt").exists()
    h = trained_run["history"]
    assert len(h["train_loss"]) == 4
    # learning happened: last train loss below the first
    assert h["train_loss"][-1] < h["train_loss"][0]


def test_checkpoint_self_describing(trained_run):
    from vad_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(trained_run["results_dir"] / "best_model.ckpt")
    assert ckpt["args"]["latent_dim"] == 64
    assert ckpt["args"]["image_size"] == 64
    assert ckpt["model_type"] == "image"
    assert "opt_state" in ckpt  # resume-capable
    # calibrated anomaly threshold: p99 of the best epoch's held-out
    # normal scores, saved for serving/UI consumption
    assert ckpt["score_threshold"] is not None and ckpt["score_threshold"] > 0
    assert ckpt["threshold_method"] == "p99 of validation normal scores"


def test_evaluate_cli(trained_run):
    import evaluate as eval_cli
    from vad_tpu.eval.image_eval import evaluate

    args = eval_cli.build_parser().parse_args(
        ["--checkpoint", str(trained_run["results_dir"] / "best_model.ckpt")]
    )
    score = evaluate(args)
    assert 0.0 <= score <= 1.0
    out = trained_run["results_dir"] / "evaluation"
    for f in ("roc_curve.png", "score_distribution.png", "reconstructions.png", "results.txt"):
        assert (out / f).exists(), f
    text = (out / "results.txt").read_text()
    assert text.startswith("AUROC: ")
    assert "defect: ANOMALY" in text
    assert "good: NORMAL" in text
    assert "Pixel-level AUROC:" in text  # localization metric (with GT masks)
    assert "AUPRO" in text  # per-region-overlap localization metric
    assert "Average precision (AUPRC):" in text  # prevalence-aware complement


def test_evaluate_cli_data_parallel(trained_run):
    """--data-parallel scores via shard_map over the 8-device mesh are
    bitwise identical to the single-device evaluation (the scoring
    computation never mixes batch elements)."""
    import evaluate as eval_cli
    from vad_tpu.eval.image_eval import evaluate

    ckpt = str(trained_run["results_dir"] / "best_model.ckpt")
    plain = evaluate(eval_cli.build_parser().parse_args(["--checkpoint", ckpt]))
    dp = evaluate(
        eval_cli.build_parser().parse_args(["--checkpoint", ckpt, "--data-parallel"])
    )
    assert dp == plain
    text = (trained_run["results_dir"] / "evaluation" / "results.txt").read_text()
    assert text.startswith(f"AUROC: {plain:.4f}")


def test_resume_continues(trained_run):
    import train as train_cli
    from vad_tpu.train.image_trainer import train

    args = train_cli.build_parser().parse_args(
        [
            "--category", "synthetic",
            "--data-dir", str(trained_run["data_dir"]),
            "--image-size", "64",
            "--latent-dim", "64",
            "--epochs", "5",
            "--batch-size", "8",
            "--num-workers", "2",
            "--results-dir", "unused",
            "--resume", str(trained_run["results_dir"] / "final_model.ckpt"),
        ]
    )
    out = train(args)
    # resumed from epoch 4 -> exactly one more epoch appended
    assert len(out["history"]["train_loss"]) == 5


@pytest.mark.slow
def test_synthetic_auroc_threshold(tmp_path):
    """Longer training separates synthetic defects (AUROC >= 0.7)."""
    from vad_tpu.data.synthetic import create_synthetic_image_data
    import train as train_cli
    import evaluate as eval_cli
    from vad_tpu.train.image_trainer import train
    from vad_tpu.eval.image_eval import evaluate

    data_dir = tmp_path / "data"
    create_synthetic_image_data(str(data_dir), "synthetic", image_size=128)
    args = train_cli.build_parser().parse_args(
        [
            "--category", "synthetic", "--data-dir", str(data_dir),
            "--image-size", "128", "--epochs", "25", "--batch-size", "16",
            "--results-dir", str(tmp_path / "results"),
        ]
    )
    out = train(args)
    eargs = eval_cli.build_parser().parse_args(
        ["--checkpoint", str(out["results_dir"] / "best_model.ckpt")]
    )
    assert evaluate(eargs) >= 0.7


def test_multiple_defect_types_breakdown(tmp_path):
    """Per-defect breakdown covers every defect folder (C18 semantics)."""
    import shutil
    from vad_tpu.data.synthetic import create_synthetic_image_data
    from vad_tpu.data.image_dataset import MVTecDataset
    from vad_tpu.eval.metrics import per_defect_breakdown
    import numpy as np

    data_dir = tmp_path / "data"
    create_synthetic_image_data(
        str(data_dir), "widget", n_train=4, n_test_good=3, n_test_defect=4, image_size=64
    )
    # split the defect folder into two defect types (scratch/crack)
    src = data_dir / "widget" / "test" / "defect"
    dst = data_dir / "widget" / "test" / "crack"
    dst.mkdir()
    gt_src = data_dir / "widget" / "ground_truth" / "defect"
    gt_dst = data_dir / "widget" / "ground_truth" / "crack"
    gt_dst.mkdir()
    for name in ("002.png", "003.png"):
        shutil.move(str(src / name), dst / name)
        shutil.move(str(gt_src / name.replace(".png", "_mask.png")),
                    gt_dst / name.replace(".png", "_mask.png"))

    ds = MVTecDataset(str(data_dir), "widget", "test", image_size=64)
    assert sorted(set(ds.defect_types)) == ["crack", "defect", "good"]
    # masks still pair up for the renamed defect type
    crack = [i for i, d in enumerate(ds.defect_types) if d == "crack"]
    assert all(ds[i]["mask"].max() > 0 for i in crack)
    rng = np.random.default_rng(0)
    breakdown = per_defect_breakdown(ds.labels, rng.random(len(ds)), ds.defect_types)
    assert breakdown["crack"]["count"] == 2
    assert breakdown["defect"]["count"] == 2
    assert breakdown["good"]["is_anomaly"] == 0


def test_score_modes(trained_run):
    """p99/max scoring modes run end-to-end and order plausibly vs mean."""
    import evaluate as eval_cli
    from vad_tpu.eval.image_eval import compute_scores, load_image_model

    model, variables, _ = load_image_model(
        trained_run["results_dir"] / "best_model.ckpt"
    )
    from vad_tpu.data.image_dataset import MVTecDataset

    ds = MVTecDataset(str(trained_run["data_dir"]), "synthetic", "test", 64)
    for mode in ("mean", "max", "p99"):
        labels, scores, _ = compute_scores(
            model, variables, ds, batch_size=8, score_mode=mode
        )
        assert scores.shape == (len(ds),)
        assert np.all(np.isfinite(scores))
    # CLI parses the flag
    args = eval_cli.build_parser().parse_args(
        ["--checkpoint", "x", "--score-mode", "p99"]
    )
    assert args.score_mode == "p99"


def test_score_smoothing(trained_run):
    """Gaussian smoothing preserves the map's mass and shape."""
    import jax.numpy as jnp
    from vad_tpu.eval.image_eval import smooth_error_map

    rng = np.random.default_rng(0)
    err = jnp.asarray(rng.random((2, 64, 64)).astype(np.float32))
    sm = smooth_error_map(err, sigma=3.0)
    assert sm.shape == err.shape
    # interior mass approximately preserved (SAME padding loses boundary)
    np.testing.assert_allclose(
        float(jnp.mean(sm[:, 16:-16, 16:-16])),
        float(jnp.mean(err[:, 16:-16, 16:-16])),
        rtol=0.02,
    )
    # blurring reduces variance
    assert float(jnp.var(sm)) < float(jnp.var(err))
