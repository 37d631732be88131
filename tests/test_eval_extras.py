"""Coverage for eval plumbing: numpy metric fallbacks, plot rendering,
frame composition, precision casting, checkpoint discovery."""

import numpy as np
import pytest

from vad_tpu.eval import metrics


class TestNumpyFallbacks:
    """The sklearn-free code paths (exercised via monkeypatching)."""

    @pytest.fixture
    def no_sklearn(self, monkeypatch):
        monkeypatch.setattr(metrics, "_sk_auroc", None)
        monkeypatch.setattr(metrics, "_sk_roc_curve", None)

    def test_auroc_matches_sklearn(self, no_sklearn, rng):
        labels = rng.integers(0, 2, size=200)
        labels[:5] = 1
        labels[5:10] = 0  # both classes guaranteed
        scores = rng.normal(size=200) + labels * 0.8
        ours = metrics.auroc(labels, scores)
        from sklearn.metrics import roc_auc_score

        assert np.isclose(ours, roc_auc_score(labels, scores), atol=1e-9)

    def test_auroc_with_ties(self, no_sklearn):
        labels = np.array([0, 0, 1, 1, 0, 1])
        scores = np.array([0.1, 0.5, 0.5, 0.9, 0.5, 0.5])  # heavy ties
        from sklearn.metrics import roc_auc_score

        assert np.isclose(
            metrics.auroc(labels, scores), roc_auc_score(labels, scores), atol=1e-9
        )

    def test_auroc_single_class_raises(self, no_sklearn):
        with pytest.raises(ValueError, match="both classes"):
            metrics.auroc(np.zeros(4), np.arange(4))

    def test_average_precision_matches_sklearn(self, no_sklearn, rng):
        labels = rng.integers(0, 2, size=200)
        labels[:5] = 1
        labels[5:10] = 0
        scores = rng.normal(size=200) + labels * 0.8
        ours = metrics.average_precision(labels, scores)
        monkey_off = metrics._sk_ap  # fixture leaves _sk_ap alone; force the path
        try:
            metrics._sk_ap = None
            fallback = metrics.average_precision(labels, scores)
        finally:
            metrics._sk_ap = monkey_off
        from sklearn.metrics import average_precision_score

        ref = average_precision_score(labels, scores)
        assert np.isclose(ours, ref, atol=1e-9)
        assert np.isclose(fallback, ref, atol=1e-9)

    def test_average_precision_with_ties(self, no_sklearn):
        labels = np.array([0, 0, 1, 1, 0, 1])
        scores = np.array([0.1, 0.5, 0.5, 0.9, 0.5, 0.5])  # heavy ties
        metrics._sk_ap_saved, metrics._sk_ap = metrics._sk_ap, None
        try:
            ours = metrics.average_precision(labels, scores)
        finally:
            metrics._sk_ap = metrics._sk_ap_saved
        from sklearn.metrics import average_precision_score

        assert np.isclose(ours, average_precision_score(labels, scores), atol=1e-9)

    def test_average_precision_hand_case(self):
        # descending scores, labels [1, 0, 1]: thresholds give
        # (P=1, R=1/2), (P=1/2, R=1/2), (P=2/3, R=1)
        # AP = 1/2 * 1 + 0 * 1/2 + 1/2 * 2/3 = 5/6
        labels = np.array([1, 0, 1])
        scores = np.array([0.9, 0.5, 0.1])
        assert np.isclose(metrics.average_precision(labels, scores), 5.0 / 6.0)

    def test_average_precision_single_class_raises(self):
        with pytest.raises(ValueError, match="both classes"):
            metrics.average_precision(np.zeros(4), np.arange(4))
        # all-positive must raise too, not return a vacuous 1.0
        with pytest.raises(ValueError, match="both classes"):
            metrics.average_precision(np.ones(4), np.arange(4))

    def test_perfect_detector_ap_is_one(self):
        labels = np.array([0, 0, 1, 1])
        scores = np.array([0.1, 0.2, 0.8, 0.9])
        assert metrics.average_precision(labels, scores) == 1.0

    def test_roc_points_fallback_shape(self, no_sklearn, rng):
        labels = np.array([0, 1] * 20)
        scores = rng.normal(size=40)
        fpr, tpr = metrics.roc_points(labels, scores)
        assert fpr[0] == 0.0 and tpr[0] == 0.0
        assert fpr[-1] == 1.0 and tpr[-1] == 1.0
        assert np.all(np.diff(fpr) >= 0)

    def test_roc_points_fallback_matches_sklearn_with_ties(self, no_sklearn):
        """Tied scores must collapse into ONE threshold step — counting
        positives before negatives at a tie draws an optimistic segment."""
        labels = np.array([0, 0, 1, 1, 0, 1, 0, 1])
        scores = np.array([0.1, 0.5, 0.5, 0.9, 0.5, 0.5, 0.9, 0.1])
        fpr, tpr = metrics.roc_points(labels, scores)
        from sklearn.metrics import roc_curve

        sk_fpr, sk_tpr, _ = roc_curve(labels, scores, drop_intermediate=False)
        np.testing.assert_allclose(fpr, sk_fpr)
        np.testing.assert_allclose(tpr, sk_tpr)
        # curve area must agree with the midrank AUROC, not exceed it
        assert np.isclose(np.trapezoid(tpr, fpr), metrics.auroc(labels, scores))


class TestAupro:
    """Per-region-overlap AUC (the standard MVTec localization metric)."""

    def _fixture(self, rng):
        masks = np.zeros((4, 64, 64))
        masks[0, 5:15, 5:15] = 1    # large region
        masks[0, 40:44, 40:44] = 1  # small region, same image
        masks[1, 20:30, 50:60] = 1
        noise = rng.normal(size=(4, 64, 64)) * 0.01
        return masks, noise

    def test_perfect_detector_is_one(self, rng):
        masks, maps = self._fixture(rng)
        maps[masks > 0.5] = 10.0
        assert metrics.aupro(masks, maps) == pytest.approx(1.0)

    def test_inverted_detector_is_zero(self, rng):
        masks, maps = self._fixture(rng)
        maps[masks > 0.5] = -10.0
        assert metrics.aupro(masks, maps) == pytest.approx(0.0, abs=1e-6)

    def test_chance_is_near_fpr_half(self, rng):
        # at chance, PRO(fpr) ~ fpr, so normalized AUC to 0.3 -> ~0.15
        masks, _ = self._fixture(rng)
        got = metrics.aupro(masks, rng.normal(size=masks.shape))
        assert 0.05 < got < 0.3

    def test_small_region_weighs_like_large(self, rng):
        """Missing the 16px region costs the same as missing the 100px one
        — the property pixel AUROC does not have."""
        masks, base = self._fixture(rng)
        hit_large = base.copy()
        hit_large[0, 5:15, 5:15] = 10.0
        hit_large[1, 20:30, 50:60] = 10.0  # small region missed
        hit_small = base.copy()
        hit_small[0, 40:44, 40:44] = 10.0
        hit_small[1, 20:30, 50:60] = 10.0  # large region missed
        a_large = metrics.aupro(masks, hit_large)
        a_small = metrics.aupro(masks, hit_small)
        # both ~2/3 of perfect (2 of 3 components found), within noise
        assert a_large == pytest.approx(a_small, abs=0.05)
        assert 0.55 < a_large < 0.75

    def test_constant_map_scores_at_chance_not_perfect(self, rng):
        """A zero-information (constant) error map must NOT get a perfect
        curve: every threshold ties, the lowest measured FPR is 1.0, and
        the FPR=0 anchor must be the PRO actually achieved above the top
        normal score (0 here) — regression for the anchor bug that
        returned 1.0."""
        masks, _ = self._fixture(rng)
        got = metrics.aupro(masks, np.full(masks.shape, 3.14))
        assert got == pytest.approx(0.15, abs=0.02)  # linear chance curve

    def test_quantized_map_not_inflated(self, rng):
        """Binary scores with 1 of 3 components found: the FPR=0 anchor is
        PRO=1/3 (what a threshold above every normal pixel achieves) and
        the only measured point is (FPR=1, PRO=1), so the clipped curve is
        the linear interpolation 1/3 + fpr*2/3 -> area/0.3 = 0.4333 — far
        from the 1.0 the old anchor reported, above the 1/3 floor."""
        masks, maps = self._fixture(rng)
        maps[:] = 0.0
        maps[0, 5:15, 5:15] = 1.0  # only the large region scores high
        got = metrics.aupro(masks, maps)
        expected = (1 / 3 + (1 / 3 + 0.3 * 2 / 3)) / 2  # trapezoid on [0, .3]
        assert got == pytest.approx(expected, abs=1e-6)

    def test_no_defects_is_nan(self, rng):
        assert np.isnan(metrics.aupro(np.zeros((2, 8, 8)), rng.normal(size=(2, 8, 8))))

    @staticmethod
    def _aupro_oracle(masks, maps, fpr_limit=0.3):
        """Independent brute-force AUPRO: sweep EVERY distinct score as a
        threshold (detection rule: score >= t, matching the searchsorted
        convention), trace (FPR, mean-PRO), anchor FPR=0 at a threshold
        above every normal pixel, clip at fpr_limit by interpolation."""
        masks = np.asarray(masks) > 0.5
        maps = np.asarray(maps, np.float64)
        comps = []
        for m, e in zip(masks, maps):
            if not m.any():
                continue
            lab, k = metrics._label_components(m)
            comps.extend(e[lab == c] for c in range(1, k + 1))
        normal = maps[~masks]
        pts = [(0.0, np.mean([(c > normal.max()).mean() for c in comps]))]
        for t in np.unique(maps):
            fpr = (normal >= t).mean()
            pro = np.mean([(c >= t).mean() for c in comps])
            pts.append((fpr, pro))
        pts.sort()
        fprs = np.array([p[0] for p in pts])
        pros = np.array([p[1] for p in pts])
        keep = fprs <= fpr_limit
        f_kept, p_kept = fprs[keep], pros[keep]
        if f_kept[-1] < fpr_limit:
            f_kept = np.concatenate([f_kept, [fpr_limit]])
            p_kept = np.concatenate([p_kept, [np.interp(fpr_limit, fprs, pros)]])
        return float(np.trapezoid(p_kept, f_kept) / fpr_limit)

    def test_matches_bruteforce_oracle(self, rng):
        """The quantile-sampled implementation tracks an exact
        every-threshold sweep on random continuous maps (dense smooth
        curves), a strong detector, and a partially-informative one."""
        masks, noise = self._fixture(rng)
        for maps in (
            rng.normal(size=masks.shape),            # chance-level
            noise + 3.0 * masks + rng.normal(size=masks.shape),  # strong
            noise + 0.8 * masks,                     # partial separation
        ):
            got = metrics.aupro(masks, maps)
            want = self._aupro_oracle(masks, maps)
            assert got == pytest.approx(want, abs=0.02), (got, want)


class TestCalibrateThreshold:
    def test_quantile_of_normal_scores(self):
        scores = np.linspace(0.0, 1.0, 101)  # p99 == 0.99
        assert metrics.calibrate_threshold(scores) == pytest.approx(0.99)
        assert metrics.calibrate_threshold(scores, 0.5) == pytest.approx(0.5)

    def test_empty_is_none(self):
        assert metrics.calibrate_threshold([]) is None

    def test_flags_about_one_percent_of_normals(self):
        rng = np.random.default_rng(0)
        normal = rng.lognormal(size=4000)
        t = metrics.calibrate_threshold(normal)
        fpr = float((normal > t).mean())
        assert 0.005 < fpr < 0.015  # ~1% FPR operating point

    def test_shape_mismatch_raises(self, rng):
        with pytest.raises(ValueError, match="masks"):
            metrics.aupro(np.zeros((2, 8, 8)), rng.normal(size=(2, 8, 9)))


def test_separation_ratio_edge_cases():
    assert metrics.separation_ratio([], [1.0]) == 0.0
    assert metrics.separation_ratio([1.0], []) == 0.0
    assert metrics.separation_ratio([2.0, 2.0], [4.0, 4.0]) == 2.0


class TestPlots:
    def test_all_plots_render(self, tmp_path, rng):
        from vad_tpu.eval.plots import (
            plot_reconstruction_grid,
            plot_roc_curve,
            plot_score_distribution,
            plot_training_history,
        )

        labels = np.array([0, 1] * 10)
        scores = rng.normal(size=20) + labels
        plot_roc_curve(labels, scores, tmp_path / "roc.png")
        plot_score_distribution(labels, scores, tmp_path / "dist.png")
        rows = [
            {
                "image": rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32),
                "recon": rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32),
                "error": rng.random((32, 32)).astype(np.float32),
                "mask": np.zeros((32, 32), np.float32),
                "defect_type": "good",
            }
        ]
        plot_reconstruction_grid(rows, tmp_path / "recon.png")
        history = {
            "train_loss": [1.0, 0.5], "val_loss": [1.1, 0.6],
            "normal_err": [0.1, 0.05], "anomaly_err": [0.2, 0.15],
        }
        plot_training_history(history, tmp_path / "hist.png")
        for f in ("roc.png", "dist.png", "recon.png", "hist.png"):
            assert (tmp_path / f).stat().st_size > 1000

    def test_empty_grid_noop(self, tmp_path):
        from vad_tpu.eval.plots import plot_reconstruction_grid

        plot_reconstruction_grid([], tmp_path / "none.png")
        assert not (tmp_path / "none.png").exists()


def test_compose_annotated_frame(rng):
    from vad_tpu.eval.video_render import compose_annotated_frame

    orig = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    recon = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    err = rng.random((64, 64)).astype(np.float32)
    frame = compose_annotated_frame(orig, recon, err, score=0.005)
    assert frame.shape == (64 + 60, 64 * 3, 3)
    assert frame.dtype == np.uint8
    # the original panel is embedded unmodified
    np.testing.assert_array_equal(frame[:64, :64], orig)


def test_cast_floating_preserves_ints():
    import jax.numpy as jnp

    from vad_tpu.utils.precision import cast_floating

    tree = {"w": jnp.ones((2, 2), jnp.float32), "step": jnp.asarray(3, jnp.int32)}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["step"].dtype == jnp.int32


def test_latest_checkpoint(tmp_path):
    from vad_tpu.utils.checkpoint import latest_checkpoint

    assert latest_checkpoint(tmp_path) is None
    for n in (1, 3, 12):
        (tmp_path / f"checkpoint_epoch_{n}.ckpt").write_bytes(b"x")
    (tmp_path / "best_model.ckpt").write_bytes(b"x")
    found = latest_checkpoint(tmp_path)
    assert found is not None and found.name == "checkpoint_epoch_12.ckpt"
