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


def test_prune_superseded_replaces_remeasured_cell(tmp_path):
    """A re-measured cell fully replaces its committed artifacts (stale
    pre-fix draws are deleted, including the draw-0 root results.txt),
    while cells this campaign did not touch are preserved, and draws the
    new summary still references survive an extension campaign."""
    dst = tmp_path / "dest"
    # committed tree: textured has draw0 (root results.txt) + draw1..draw3;
    # synthetic was measured in an earlier campaign and is untouched here
    _write(dst / "vad_tpu/textured/results.txt", "AUROC: 0.60\n")
    for i in (1, 2, 3):
        _write(dst / f"vad_tpu/textured/draw{i}/results.txt",
               f"AUROC: 0.6{i}\n")
    _write(dst / "vad_tpu/synthetic/results.txt", "AUROC: 0.97\n")

    # fresh campaign re-measured textured with draws 2 and 4 only
    src = tmp_path / "work"
    _write(src / "vad_tpu/textured/draw2/results.txt", "AUROC: 0.72\n")
    _write(src / "vad_tpu/textured/draw4/results.txt", "AUROC: 0.74\n")
    summary = {"runs": [
        {"side": "vad_tpu", "fixture": "textured", "draw": 2, "auroc": 0.72},
        {"side": "vad_tpu", "fixture": "textured", "draw": 4, "auroc": 0.74},
    ]}

    rp.prune_superseded(summary, src, dst)

    tex = dst / "vad_tpu/textured"
    assert not (tex / "results.txt").exists()          # draw 0 superseded
    assert not (tex / "draw1").exists()                # superseded
    assert (tex / "draw2/results.txt").exists()        # still referenced
    assert not (tex / "draw3").exists()                # superseded
    assert (dst / "vad_tpu/synthetic/results.txt").exists()  # untouched cell


def test_merge_artifacts_matches_committed_tree():
    """The committed draws.json is a fixed point: every artifact on disk
    is already recorded, so reconstruction adds nothing."""
    import json

    dest = REPO / "results" / "parity_vs_reference"
    summary = json.loads((dest / "draws.json").read_text())
    added = rp.merge_artifacts(summary, dest / "artifacts")
    assert added == []
