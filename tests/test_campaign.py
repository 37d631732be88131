"""Multi-category campaigns (--category all): discovery, checkpoint
resolution, and the train-all -> evaluate-all loop with the
cross-category summary.  Beyond-reference: the reference is strictly
one-category-per-invocation (train.py:242, evaluate.py:287), while
MVTec reporting convention is per-category metrics plus the mean."""

from pathlib import Path

import pytest

from vad_tpu import campaign


class TestDiscovery:
    def test_discover_categories(self, tmp_path):
        for name in ("catB", "catA"):
            (tmp_path / name / "train" / "good").mkdir(parents=True)
        (tmp_path / "not_a_cat").mkdir()  # no train/ split
        (tmp_path / "stray.txt").write_text("x")
        assert campaign.discover_categories(tmp_path) == ["catA", "catB"]

    def test_discover_missing_root(self, tmp_path):
        assert campaign.discover_categories(tmp_path / "nope") == []

    def test_categories_from_arg(self, tmp_path):
        (tmp_path / "cat" / "train").mkdir(parents=True)
        assert campaign.categories_from_arg("bottle", tmp_path) == ["bottle"]
        assert campaign.categories_from_arg("a, b,c", tmp_path) == ["a", "b", "c"]
        assert campaign.categories_from_arg("all", tmp_path) == ["cat"]
        assert campaign.categories_from_arg(None, tmp_path) == ["cat"]

    def test_all_with_no_categories_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="no category"):
            campaign.categories_from_arg("all", tmp_path)


class TestCheckpointResolution:
    def _mk_run(self, root: Path, name: str, with_ckpt: bool = True):
        d = root / name
        d.mkdir(parents=True)
        if with_ckpt:
            (d / "best_model.ckpt").write_bytes(b"x")

    def test_newest_wins(self, tmp_path):
        self._mk_run(tmp_path, "bottle_20250101_000000")
        self._mk_run(tmp_path, "bottle_20250301_000000")
        got = campaign.checkpoint_for_category(tmp_path, "bottle")
        assert got.parent.name == "bottle_20250301_000000"

    def test_prefix_category_not_confused(self, tmp_path):
        """'bottle' must not pick up 'bottle_cap' runs (and vice versa)
        even though 'bottle_' prefixes both dir names."""
        self._mk_run(tmp_path, "bottle_20250101_000000")
        self._mk_run(tmp_path, "bottle_cap_20250901_000000")
        assert (
            campaign.checkpoint_for_category(tmp_path, "bottle").parent.name
            == "bottle_20250101_000000"
        )
        assert (
            campaign.checkpoint_for_category(tmp_path, "bottle_cap").parent.name
            == "bottle_cap_20250901_000000"
        )

    def test_run_without_ckpt_skipped(self, tmp_path):
        self._mk_run(tmp_path, "bottle_20250301_000000", with_ckpt=False)
        self._mk_run(tmp_path, "bottle_20250101_000000")
        got = campaign.checkpoint_for_category(tmp_path, "bottle")
        assert got.parent.name == "bottle_20250101_000000"

    def test_none_when_untrained(self, tmp_path):
        assert campaign.checkpoint_for_category(tmp_path, "bottle") is None

    def test_discover_trained_categories(self, tmp_path):
        self._mk_run(tmp_path, "bottle_20250101_000000")
        self._mk_run(tmp_path, "cable_20250201_000000")
        self._mk_run(tmp_path, "screw_20250301_000000", with_ckpt=False)
        self._mk_run(tmp_path, "video_S01_20250401_000000")  # video run: excluded
        (tmp_path / "stray").mkdir()
        assert campaign.discover_trained_categories(tmp_path) == ["bottle", "cable"]
        assert campaign.discover_trained_categories(tmp_path / "nope") == []


class TestSummaryFormat:
    def test_csv_absent_metric_is_empty_cell(self, tmp_path):
        """'-' breaks naive float parsing of the machine-readable file;
        absent metrics must be EMPTY csv cells ('-' stays in the txt)."""
        rows = {"a": {"auroc": 0.9, "ap": 0.8}, "b": {"auroc": 0.7}}
        campaign.write_summary(tmp_path, rows, missing=["c"], failed=["d"])
        csv = (tmp_path / "summary.csv").read_text().strip().splitlines()
        assert csv[2] == "b,0.7000,,,"
        assert "-" not in (tmp_path / "summary.csv").read_text()
        txt = (tmp_path / "summary.txt").read_text()
        assert "-" in txt
        assert "Skipped (no checkpoint): c" in txt
        assert "Failed (evaluation error): d" in txt


class TestCampaignResumeRejected:
    def test_train_resume_with_all_rejected(self):
        """One resume checkpoint cannot apply to a multi-category
        campaign; argparse must reject the combination (train.py)."""
        import subprocess
        import sys

        proc = subprocess.run(
            [sys.executable, "train.py", "--category", "all",
             "--resume", "x.ckpt"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert proc.returncode == 2
        assert "--resume cannot be combined" in proc.stderr


@pytest.fixture(scope="module")
def campaign_run(tmp_path_factory):
    """Two tiny categories trained via --category all."""
    from vad_tpu.data.synthetic import create_synthetic_image_data

    import train as train_cli

    root = tmp_path_factory.mktemp("campaign")
    data_dir = root / "data"
    for cat in ("alpha", "beta"):
        create_synthetic_image_data(
            str(data_dir), cat, n_train=8, n_test_good=4, n_test_defect=4,
            image_size=64,
        )
    args = train_cli.build_parser().parse_args(
        [
            "--category", "all",
            "--data-dir", str(data_dir),
            "--image-size", "64",
            "--latent-dim", "32",
            "--epochs", "2",
            "--batch-size", "8",
            "--num-workers", "2",
            "--results-dir", str(root / "results"),
        ]
    )
    runs = campaign.train_all(args)
    return {"data_dir": data_dir, "results_dir": root / "results", "runs": runs}


class TestEndToEnd:
    def test_train_all_produces_per_category_runs(self, campaign_run):
        runs = campaign_run["runs"]
        assert set(runs) == {"alpha", "beta"}
        for cat, run_dir in runs.items():
            assert run_dir.name.startswith(f"{cat}_")
            assert (run_dir / "best_model.ckpt").exists()

    def test_evaluate_all_summary(self, campaign_run):
        import evaluate as eval_cli

        args = eval_cli.build_parser().parse_args(
            [
                "--checkpoint", str(campaign_run["results_dir"]),
                "--category", "all",
                "--data-dir", str(campaign_run["data_dir"]),
            ]
        )
        args.results_dir = args.checkpoint  # the __main__ wiring does this
        rows = campaign.evaluate_all(args)
        assert set(rows) == {"alpha", "beta"}
        for row in rows.values():
            assert 0.0 <= row["auroc"] <= 1.0
            assert 0.0 <= row["ap"] <= 1.0

        out = campaign_run["results_dir"] / "evaluation_all"
        txt = (out / "summary.txt").read_text()
        csv = (out / "summary.csv").read_text().strip().splitlines()
        assert "alpha" in txt and "beta" in txt and "mean" in txt
        assert csv[0] == "category,auroc,ap,pixel_auroc,aupro"
        assert csv[-1].startswith("mean,")
        # mean AUROC cell equals the average of the category cells
        cells = {ln.split(",")[0]: ln.split(",")[1] for ln in csv[1:]}
        mean = (float(cells["alpha"]) + float(cells["beta"])) / 2
        assert abs(float(cells["mean"]) - mean) < 5e-5

    def test_evaluate_all_isolates_failures(self, campaign_run, monkeypatch, capsys):
        """A category whose evaluation throws is recorded as failed; the
        summary is still written for the categories that succeeded
        (parity with train_all's isolation contract)."""
        import evaluate as eval_cli
        import vad_tpu.eval.image_eval as image_eval

        real_evaluate = image_eval.evaluate

        def exploding(args):
            if args.category == "alpha":
                raise RuntimeError("boom: corrupt checkpoint")
            return real_evaluate(args)

        monkeypatch.setattr(image_eval, "evaluate", exploding)
        args = eval_cli.build_parser().parse_args(
            [
                "--checkpoint", str(campaign_run["results_dir"]),
                "--category", "all",
                "--data-dir", str(campaign_run["data_dir"]),
            ]
        )
        args.results_dir = args.checkpoint
        rows = campaign.evaluate_all(args)
        assert set(rows) == {"beta"}
        out = capsys.readouterr().out
        assert "alpha evaluation FAILED" in out and "boom" in out
        summary = (
            campaign_run["results_dir"] / "evaluation_all" / "summary.txt"
        ).read_text()
        assert "beta" in summary
        assert "Failed (evaluation error): alpha" in summary

    def test_evaluate_all_without_data_dir_discovers_from_runs(
        self, campaign_run, capsys
    ):
        """--category all with no --data-dir: categories come from the
        trained run dirs; each evaluate reads data_dir from its ckpt."""
        import evaluate as eval_cli

        args = eval_cli.build_parser().parse_args(
            ["--checkpoint", str(campaign_run["results_dir"]), "--category", "all"]
        )
        args.results_dir = args.checkpoint
        rows = campaign.evaluate_all(args)
        assert set(rows) == {"alpha", "beta"}

    def test_evaluate_all_without_data_dir_or_runs_raises(self, tmp_path):
        import argparse

        args = argparse.Namespace(
            results_dir=str(tmp_path), data_dir=None, category="all"
        )
        with pytest.raises(FileNotFoundError, match="no trained"):
            campaign.evaluate_all(args)

    def test_campaign_skips_missing_checkpoint(self, campaign_run, tmp_path, capsys):
        import evaluate as eval_cli

        (campaign_run["data_dir"] / "gamma" / "train" / "good").mkdir(parents=True)
        try:
            args = eval_cli.build_parser().parse_args(
                [
                    "--checkpoint", str(campaign_run["results_dir"]),
                    "--category", "gamma",
                    "--data-dir", str(campaign_run["data_dir"]),
                ]
            )
            args.results_dir = args.checkpoint
            rows = campaign.evaluate_all(args)
            assert rows == {}
            assert "no trained checkpoint" in capsys.readouterr().out
        finally:
            import shutil

            shutil.rmtree(campaign_run["data_dir"] / "gamma")
