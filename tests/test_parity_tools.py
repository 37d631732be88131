"""The parity harness's artifact-reconstruction path.

The campaign's scratch work dir (summary.json) lives in /tmp and dies
with the host; the per-draw results.txt artifacts are committed under
results/parity_vs_reference/artifacts.  ``merge_artifacts`` must be able
to rebuild the per-draw AUROC records from those committed copies alone
(jax-free: pure filesystem + regex parsing).
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools" / "parity"))

import run_parity as rp  # noqa: E402


def _write(p: Path, text: str) -> None:
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text)


def test_merge_artifacts_reconstructs_missing_draws(tmp_path):
    art = tmp_path / "artifacts"
    # image fixture: draw 0 at the fixture root, draw 3 in a subdir
    _write(art / "vad_tpu/textured/results.txt", "AUROC: 0.6453\n")
    _write(art / "vad_tpu/textured/draw3/results.txt",
           "AUROC: 0.6267\n\nPer-defect breakdown:\n")
    # video fixture with both sequence- and frame-level metrics
    _write(art / "reference/textured_video/draw1/results.txt",
           "Sequence-level AUROC: 0.7263\nFrame-level AUROC: 0.7000\n")
    # unknown fixture dirs and unparseable files are skipped, not fatal
    _write(art / "vad_tpu/not_a_fixture/results.txt", "AUROC: 0.5\n")
    _write(art / "vad_tpu/synthetic/results.txt", "no metrics here\n")

    summary = {"runs": [
        {"side": "vad_tpu", "fixture": "textured", "draw": 0, "auroc": 0.6453},
    ]}
    added = rp.merge_artifacts(summary, art)

    keys = {(r["side"], r["fixture"], r["draw"]) for r in added}
    assert keys == {("vad_tpu", "textured", 3),
                    ("reference", "textured_video", 1)}
    by_key = {(r["side"], r["fixture"], r["draw"]): r for r in summary["runs"]}
    assert by_key[("vad_tpu", "textured", 3)]["auroc"] == 0.6267
    vid = by_key[("reference", "textured_video", 1)]
    assert vid["auroc"] == 0.7263 and vid["frame_auroc"] == 0.7000
    # existing records are never duplicated
    assert len([r for r in summary["runs"]
                if (r["side"], r["fixture"], r.get("draw", 0))
                == ("vad_tpu", "textured", 0)]) == 1


def test_merge_artifacts_matches_committed_tree():
    """The committed draws.json is a fixed point: every artifact on disk
    is already recorded, so reconstruction adds nothing."""
    import json

    dest = REPO / "results" / "parity_vs_reference"
    summary = json.loads((dest / "draws.json").read_text())
    added = rp.merge_artifacts(summary, dest / "artifacts")
    assert added == []
