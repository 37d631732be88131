"""Head-to-head accuracy parity: unmodified reference vs vad_tpu.

MVTec-AD is unreachable in this sandbox (zero egress), so the strongest
available substitute for the reference's published bottle number
(reference results/bottle_20251208_130745/evaluation/results.txt:1) is a
direct comparison on SHARED data at EQUAL budgets: the reference code at
/root/reference runs unmodified (torch CPU, with the minimal torchvision
shim in tools/parity/shims) and vad_tpu runs on TPU, both trained and
evaluated on the same deterministic synthetic fixtures with identical
hyperparameters.

Usage:
    python tools/parity/run_parity.py --work-dir /tmp/parity [--only NAME]
        [--draws N]

Results accumulate in <work-dir>/summary.json (resumable: completed
(side, fixture, draw) triples are skipped) and are rendered into
results/parity_vs_reference/README.md.

STATISTICAL CLOSURE (multiple draws): the trainers are stochastic (the
reference is entirely unseeded) and the fixtures' test sets are small,
so a one-draw-per-side table overstates differences.  ``--draws N`` runs
N independent draws per (side, fixture) — vad_tpu uses seed=draw, the
reference simply retrains unseeded — and the table reports mean ± half-
range over all recorded draws.  Draws measured in earlier rounds (the
VARIANCE.md spread study) are folded in via PRIOR_DRAWS below so no
measurement is discarded.
"""

from __future__ import annotations

import argparse
import json
import re
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
REFERENCE = Path("/root/reference")
SHIMS = Path(__file__).resolve().parent / "shims"

# Equal budgets per fixture; image fixtures use the reference's published
# default config (train.py:244-263), video fixtures a reduced-resolution
# config both sides can complete on this host.
FIXTURES = [
    {
        "name": "synthetic",
        "kind": "image",
        "gen": "synthetic",
        "flags": [
            "--category", "synthetic", "--image-size", "256", "--epochs", "50",
            "--batch-size", "16", "--lr", "1e-3", "--loss", "mse",
        ],
    },
    {
        "name": "textured",
        "kind": "image",
        "gen": "synthetic-textured",
        "flags": [
            "--category", "textured", "--image-size", "256", "--epochs", "50",
            "--batch-size", "16", "--lr", "1e-3", "--loss", "combined",
            "--ssim-weight", "0.5",
        ],
    },
    {
        "name": "video_synthetic",
        "kind": "video",
        "gen": "synthetic-video",
        "flags": [
            "--category", "S01", "--image-size", "128", "--sequence-length", "8",
            "--stride", "4", "--epochs", "15", "--batch-size", "4", "--lr", "1e-4",
        ],
    },
    {
        "name": "textured_video",
        "kind": "video",
        "gen": "synthetic-textured-video",
        "flags": [
            "--category", "T01", "--image-size", "128", "--sequence-length", "8",
            "--stride", "4", "--epochs", "15", "--batch-size", "4", "--lr", "1e-4",
        ],
    },
]


# Draws measured during the round-2 variance study (VARIANCE.md): real
# training runs whose aurocs were recorded but which predate the draw
# bookkeeping.  Merged into summary.json on first load (draw 0 of each
# (side, fixture) is the original headline run and already lives there).
#
# Round 4 removed the stale vad_tpu IMAGE entries (synthetic seeds 1/2:
# 0.9950, 0.9300): they were trained under the pre-fix procedure that
# DROPPED the tail batch (25-33% fewer optimizer steps per epoch than
# the torch reference takes — see results/experiments/
# tail_batch_procedure.md), so they no longer measure the shipped
# trainer.  The vad_tpu video entries stay: both video fixtures'
# sequence counts divide the batch size (44 % 4 == 92 % 4 == 0), so no
# tail batch ever existed there and the fix is a no-op for them.
PRIOR_DRAWS = [
    {"side": "reference", "fixture": "synthetic", "draw": 1, "auroc": 0.9600,
     "source": "VARIANCE.md round-2 spread study (unseeded redraw)"},
    {"side": "reference", "fixture": "textured_video", "draw": 1, "auroc": 0.7263,
     "source": "VARIANCE.md round-2 spread study (unseeded redraw)"},
    {"side": "vad_tpu", "fixture": "textured_video", "draw": 1, "auroc": 0.4316,
     "source": "VARIANCE.md round-2 spread study (seed 1)"},
    {"side": "vad_tpu", "fixture": "textured_video", "draw": 2, "auroc": 0.5289,
     "source": "VARIANCE.md round-2 spread study (seed 2)"},
]


def gen_fixtures(data_dir: Path) -> None:
    for f in FIXTURES:
        cat = f["flags"][f["flags"].index("--category") + 1]
        if (data_dir / cat).exists():
            continue
        subprocess.run(
            [sys.executable, "-m", "vad_tpu.data.synthetic", "--method", f["gen"],
             "--data-dir", str(data_dir), "--category", cat],
            cwd=REPO, check=True,
        )


def run(cmd, cwd, env_extra=None, check=True, timeout=None) -> tuple[str, float, int]:
    """Run a harness subprocess, capturing stdout+stderr.

    ``timeout`` (seconds) guards against a hung remote-TPU tunnel: a
    round-5 campaign lost a draw to an eval whose TCP connection to the
    tunnel relay dropped mid-scoring — the client blocked on a futex
    forever with the eval 99% complete.  A generous wall-clock bound
    turns that silent hang into a retryable failure (rc=124).
    """
    import os

    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            cmd, cwd=cwd, env=env, check=check,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired as e:
        out = e.output or ""
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        return out, time.perf_counter() - t0, 124
    return proc.stdout, time.perf_counter() - t0, proc.returncode


def find_run_dir(stdout: str) -> Path:
    m = re.search(r"Models saved to: (\S+)", stdout)
    if not m:
        raise RuntimeError(f"no run dir in output:\n{stdout[-2000:]}")
    return Path(m.group(1))


def parse_aurocs(kind: str, results_txt: Path, eval_stdout: str) -> dict:
    text = eval_stdout
    if results_txt.exists():
        text = results_txt.read_text() + "\n" + text
    out = {}
    if kind == "image":
        m = re.search(r"AUROC: ([0-9.]+)", text)
        out["auroc"] = float(m.group(1))
        m = re.search(r"Pixel AUROC: ([0-9.]+)", text)
        if m:
            out["pixel_auroc"] = float(m.group(1))
    else:
        m = re.search(r"Sequence-level AUROC: ([0-9.]+)", text)
        out["auroc"] = float(m.group(1))
        m = re.search(r"Frame-level AUROC: ([0-9.]+)", text)
        if m:
            out["frame_auroc"] = float(m.group(1))
    return out


def merge_artifacts(summary: dict, artifacts: Path) -> list:
    """Fold committed per-draw results.txt artifacts into ``summary``.

    The harness copies each draw's results.txt to
    ``artifacts/<side>/<fixture>[/drawN]/results.txt`` (draw 0 at the
    fixture root).  The scratch work dir holding summary.json lives in
    /tmp and does not survive a host restart, but the artifacts are
    committed — this reconstructs the per-draw AUROC records from the
    committed copies so the table can be re-rendered without
    re-measuring.  Only (side, fixture, draw) triples missing from
    ``summary`` are added; reconstructed records carry no timing.
    Returns the added records.
    """
    kinds = {f["name"]: f["kind"] for f in FIXTURES}
    have = {(r["side"], r["fixture"], r.get("draw", 0)) for r in summary["runs"]}
    added = []
    for side_dir in sorted(artifacts.iterdir()) if artifacts.is_dir() else []:
        for fix_dir in sorted(side_dir.iterdir()):
            if fix_dir.name not in kinds:
                continue
            draws = {0: fix_dir / "results.txt"}
            for sub in fix_dir.glob("draw*"):
                draws[int(sub.name[4:])] = sub / "results.txt"
            for draw, txt in sorted(draws.items()):
                if not txt.exists():
                    continue
                key = (side_dir.name, fix_dir.name, draw)
                if key in have:
                    continue
                try:
                    metrics = parse_aurocs(kinds[fix_dir.name], txt, "")
                except AttributeError:  # results.txt without the AUROC line
                    print(f"[merge-artifacts] skip unparseable {txt}")
                    continue
                rec = {
                    "side": side_dir.name, "fixture": fix_dir.name, "draw": draw,
                    **metrics,
                }
                summary["runs"].append(rec)
                added.append(rec)
    return added


def prune_superseded(summary: dict, art_src: Path, art_dst: Path) -> None:
    """Delete committed draw artifacts the summary no longer references.

    Scoped to (side, fixture) cells present in ``art_src`` — cells this
    campaign did not touch keep their committed artifacts untouched.
    Within a touched cell, a committed drawN directory (or the draw-0
    results.txt at the cell root) whose draw number is absent from
    ``summary['runs']`` is a superseded measurement; leaving it behind
    would let a later ``--merge-artifacts`` resurrect it into a summary
    built under a different trainer procedure.  Extension campaigns are
    unaffected: draws still referenced by the summary are kept.
    """
    for side_dir in sorted(art_src.iterdir()):
        for fix_dir in sorted(p for p in side_dir.iterdir() if p.is_dir()):
            tgt = art_dst / side_dir.name / fix_dir.name
            if not tgt.is_dir():
                continue
            live = {
                r.get("draw", 0)
                for r in summary["runs"]
                if r["side"] == side_dir.name and r["fixture"] == fix_dir.name
            }
            for sub in tgt.glob("draw*"):
                if int(sub.name[4:]) not in live:
                    print(f"[prune-superseded] {sub}")
                    shutil.rmtree(sub)
            if 0 not in live and (tgt / "results.txt").exists():
                print(f"[prune-superseded] {tgt / 'results.txt'}")
                (tgt / "results.txt").unlink()


def run_side(side: str, fixture: dict, data_dir: Path, out_dir: Path,
             draw: int = 0) -> dict:
    kind = fixture["kind"]
    train_script = "train_video.py" if kind == "video" else "train.py"
    eval_script = "evaluate_video.py" if kind == "video" else "evaluate.py"
    if side == "reference":
        cwd, ckpt_name = REFERENCE, "best_model.pth"
        env = {"PYTHONPATH": f"{SHIMS}:/root/.axon_site"}
        extra = ["--num-workers", "0"]  # unseeded: every draw is fresh
    else:
        cwd, ckpt_name = REPO, "best_model.ckpt"
        env = None
        extra = ["--seed", str(draw)]

    results_dir = out_dir / side if draw == 0 else out_dir / f"{side}_draw{draw}"
    results_dir.mkdir(parents=True, exist_ok=True)
    train_cmd = [
        sys.executable, train_script, *fixture["flags"], *extra,
        "--data-dir", str(data_dir), "--results-dir", str(results_dir),
    ]
    print(f"[{side}/{fixture['name']}/draw{draw}] training: {' '.join(train_cmd)}",
          flush=True)
    # one retry on failure/timeout: a dropped tunnel connection shows up
    # as a hung (now timed-out) or crashed subprocess; a fresh process
    # re-acquires the tunnel cleanly
    for attempt in (1, 2):
        stdout, train_s, train_rc = run(train_cmd, cwd, env, check=False,
                                        timeout=7200)
        if train_rc == 0:
            break
        print(f"[{side}/{fixture['name']}/draw{draw}] train attempt {attempt} "
              f"failed (rc={train_rc})", flush=True)
    if train_rc != 0:
        raise RuntimeError(
            f"{side}/{fixture['name']} training failed twice "
            f"(rc={train_rc}):\n{stdout[-2000:]}"
        )
    run_dir = find_run_dir(stdout)
    (results_dir / f"{fixture['name']}_train.log").write_text(stdout)

    eval_cmd = [
        sys.executable, eval_script, "--checkpoint", str(run_dir / ckpt_name),
        "--data-dir", str(data_dir),
    ]
    print(f"[{side}/{fixture['name']}] evaluating", flush=True)
    # check=False: the unmodified reference crashes in its own visualization
    # step at image-size 128 (evaluate_video.py:283 hardcodes a 256x256
    # heatmap) AFTER printing the AUROC; tolerate that and parse stdout.
    for attempt in (1, 2):
        eval_out, eval_s, eval_rc = run(eval_cmd, cwd, env, check=False,
                                        timeout=1800)
        if eval_rc == 0 or "AUROC" in eval_out:
            break
        print(f"[{side}/{fixture['name']}] eval attempt {attempt} failed "
              f"(rc={eval_rc})", flush=True)
    (results_dir / f"{fixture['name']}_eval.log").write_text(eval_out)
    results_txt = run_dir / "evaluation" / "results.txt"
    if eval_rc != 0 and "AUROC" not in eval_out:
        raise RuntimeError(
            f"{side}/{fixture['name']} eval failed (rc={eval_rc}):\n{eval_out[-2000:]}"
        )
    if not results_txt.exists():
        # reference crashed before writing results.txt; synthesize it from the
        # stdout metrics so the committed artifact set is complete
        results_txt.parent.mkdir(parents=True, exist_ok=True)
        metric_lines = [
            ln for ln in eval_out.splitlines()
            if "AUROC" in ln or "mean:" in ln or "Separation" in ln
        ]
        results_txt.write_text(
            "(reconstructed from eval stdout; the unmodified reference crashed in\n"
            "its visualization step at image-size 128 before writing results.txt)\n"
            + "\n".join(metric_lines) + "\n"
        )

    rec = {
        "side": side,
        "fixture": fixture["name"],
        "draw": draw,
        "train_seconds": round(train_s, 1),
        "eval_seconds": round(eval_s, 1),
        "run_dir": str(run_dir),
        **parse_aurocs(kind, results_txt, eval_out),
    }
    if side == "reference" and kind == "video" and "frame_auroc" not in rec:
        # the reference's own frame-AUROC branch is dead code for IPAD
        # data (IPADDataset.__getitem__ drops frame_labels —
        # video_dataset.py:145-151); compute the number it would have
        # printed via tools/parity/ref_frame_auroc.py (reference model +
        # dataset + scoring; only the label plumbing is harness code)
        cat = fixture["flags"][fixture["flags"].index("--category") + 1]
        fa_out, _, fa_rc = run(
            [sys.executable, str(REPO / "tools/parity/ref_frame_auroc.py"),
             "--checkpoint", str(run_dir / ckpt_name),
             "--data-dir", str(data_dir), "--category", cat],
            cwd=REFERENCE, env_extra=env, check=False,
        )
        m = re.search(r"Frame-level AUROC: ([0-9.]+)", fa_out)
        if m:
            rec["frame_auroc"] = float(m.group(1))
            with results_txt.open("a") as fh:
                fh.write(
                    f"Frame-level AUROC: {m.group(1)}\n"
                    "(computed out-of-band by tools/parity/ref_frame_auroc.py: "
                    "the reference's IPADDataset.__getitem__ drops frame_labels, "
                    "so its own frame-AUROC branch never runs)\n"
                )
        else:
            print(f"[{side}/{fixture['name']}] frame-AUROC tool rc={fa_rc}:\n"
                  f"{fa_out[-500:]}")
    # procedure provenance: vad draws measure the repo at a specific
    # commit (round 4's tail-batch fix showed why this matters — draws
    # from different trainer procedures must never be conflated in one
    # cell); the reference is fixed upstream code, so no hash needed
    if side == "vad_tpu":
        try:
            rec["repo_commit"] = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                capture_output=True, text=True, check=True,
            ).stdout.strip()
        except (OSError, subprocess.CalledProcessError):
            pass
    # keep the artifact for the committed table
    keep = out_dir / "artifacts" / side / fixture["name"]
    if draw:
        keep = keep / f"draw{draw}"
    keep.mkdir(parents=True, exist_ok=True)
    shutil.copy2(results_txt, keep / "results.txt")
    return rec


def _cell(draws: list) -> str:
    """mean ± half-range (n=..) cell over a fixture's draws."""
    vals = [r["auroc"] for r in draws]
    mean = sum(vals) / len(vals)
    if len(vals) == 1:
        return f"{mean:.4f} (n=1)"
    half = (max(vals) - min(vals)) / 2
    return f"{mean:.4f} ± {half:.4f} (n={len(vals)})"


def _verdict(ref_vals: list, vad_vals: list) -> str:
    """✓ when the vad mean is at or above the reference mean; ≈ when the
    observed ranges overlap (a statistical tie at these draw counts);
    ✗ only when every vad draw is below every reference draw."""
    rmean = sum(ref_vals) / len(ref_vals)
    vmean = sum(vad_vals) / len(vad_vals)
    if vmean >= rmean:
        return "✓"
    if max(vad_vals) >= min(ref_vals):
        return "≈"
    return "✗"


def render(summary: dict, dest: Path) -> None:
    draws: dict = {}
    for r in summary["runs"]:
        draws.setdefault((r["side"], r["fixture"]), []).append(r)
    lines = [
        "# Accuracy parity: vad_tpu (TPU) vs reference (torch CPU)",
        "",
        "MVTec-AD is not downloadable in this environment (zero egress), so this",
        "is the head-to-head substitute for the reference's published MVTec-bottle",
        "AUROC 0.8913: both implementations trained and evaluated on the SAME",
        "deterministic synthetic fixtures with IDENTICAL hyperparameters. The",
        "reference runs unmodified from /root/reference (torch CPU; only a minimal",
        "torchvision transforms shim is injected — tools/parity/shims). vad_tpu",
        "runs its normal CLI path on the TPU. Reproduce with:",
        "",
        "    python tools/parity/run_parity.py --work-dir /tmp/parity --draws 3",
        "",
        "Cells are mean ± half-range over n independent training draws",
        "(reference: unseeded re-runs; vad_tpu: seeds 0..n-1).  ✓ = vad mean",
        "at/above reference mean; ≈ = means differ but the observed ranges",
        "overlap (statistical tie at this draw count); ✗ = every vad draw",
        "below every reference draw.",
        "",
        "| Fixture | Budget | reference AUROC | vad_tpu AUROC | | ref train s | vad train s |",
        "|---|---|---|---|---|---|---|",
    ]
    budgets = {
        "synthetic": "50 ep, 256px, mse",
        "textured": "50 ep, 256px, combined",
        "video_synthetic": "15 ep, 128px, T=8",
        "textured_video": "15 ep, 128px, T=8",
    }
    for f in FIXTURES:
        ref = draws.get(("reference", f["name"]))
        vad = draws.get(("vad_tpu", f["name"]))
        if not (ref and vad):
            continue
        mark = _verdict([r["auroc"] for r in ref], [v["auroc"] for v in vad])
        tsec = {
            side: next(
                (r["train_seconds"] for r in rows if "train_seconds" in r), None
            )
            for side, rows in (("ref", ref), ("vad", vad))
        }
        # prior-session draws carry no timing; render "-" instead of
        # crashing on None when a side has only such draws
        t_ref, t_vad = (
            "-" if tsec[k] is None else f"{tsec[k]:.0f}" for k in ("ref", "vad")
        )
        lines.append(
            f"| {f['name']} | {budgets[f['name']]} | {_cell(ref)} | "
            f"{_cell(vad)} | {mark} | {t_ref} | {t_vad} |"
        )

    # per-draw detail so no aggregate hides a raw number
    lines += ["", "Per-draw values:", "",
              "| Fixture | side | draw | AUROC | source |", "|---|---|---|---|---|"]
    for f in FIXTURES:
        for side in ("reference", "vad_tpu"):
            for r in sorted(draws.get((side, f["name"]), []), key=lambda r: r.get("draw", 0)):
                src = r.get("source", "this harness")
                lines.append(
                    f"| {f['name']} | {side} | {r.get('draw', 0)} | "
                    f"{r['auroc']:.4f} | {src} |"
                )

    frame_rows = []
    for f in FIXTURES:
        if f["kind"] != "video":
            continue
        ref = [r for r in draws.get(("reference", f["name"]), []) if "frame_auroc" in r]
        vad = [v for v in draws.get(("vad_tpu", f["name"]), []) if "frame_auroc" in v]
        if ref or vad:
            frame_rows.append((f["name"], ref, vad))
    if frame_rows:
        lines += ["", "Frame-level AUROC (video fixtures):", "",
                  "| Fixture | reference | vad_tpu |", "|---|---|---|"]
        for n, ref, vad in frame_rows:
            rf = _cell([{"auroc": r["frame_auroc"]} for r in ref]) if ref else "—"
            vf = _cell([{"auroc": v["frame_auroc"]} for v in vad]) if vad else "—"
            lines.append(f"| {n} | {rf} | {vf} |")
    lines += [
        "",
        "Wall-clock columns are full training runs of draw 0 (same epochs both",
        "sides): reference on the host CPU, vad_tpu on one TPU chip through a",
        "remote tunnel. Raw results.txt files from both sides are committed",
        "next to this file (per-draw under artifacts/). Caveats: fixtures are",
        "synthetic, not MVTec.",
        "",
        "The seed-spread study behind the multi-draw protocol and a",
        "train-vs-eval decomposition via checkpoint interop are in",
        "[VARIANCE.md](VARIANCE.md).",
    ]
    # durable hand-written annotations live in NOTES.md (this file is
    # machine-rendered and fully overwritten on every render)
    if (dest / "NOTES.md").exists():
        lines += ["", "Round-by-round movement notes (what changed between",
                  "campaigns and why draws were re-run) are in",
                  "[NOTES.md](NOTES.md)."]
    dest.mkdir(parents=True, exist_ok=True)
    (dest / "README.md").write_text("\n".join(lines) + "\n")
    (dest / "draws.json").write_text(json.dumps(summary, indent=2) + "\n")
    print(f"wrote {dest / 'README.md'}")


# draw targets per fixture (round 4): textured_video goes to n=8 per
# side — at n=5 its vad mean sat below the reference mean and the round-3
# review asked for either a systematic cause or enough draws to show the
# means converge within half-range (textured_video is chance-level on
# both sides — VARIANCE.md — so it takes the most draws).  The two cells
# that were still n=1 (textured, video_synthetic) went to n=3 first;
# textured then showed the same sub-reference-mean-but-overlapping
# pattern textured_video had at n=5, so it gets the same n=8 treatment.
DRAW_TARGETS = {
    "synthetic": 3,
    "textured": 8,
    "video_synthetic": 3,
    "textured_video": 8,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/parity")
    ap.add_argument("--only", default=None, help="fixture name filter")
    ap.add_argument("--side", default=None, choices=["reference", "vad_tpu"])
    ap.add_argument("--render-only", action="store_true")
    ap.add_argument("--draws", type=int, default=None,
                    help="draws per (side, fixture); default DRAW_TARGETS")
    ap.add_argument("--merge-artifacts", action="store_true",
                    help="reconstruct draws missing from summary.json from "
                         "the committed results/parity_vs_reference/artifacts "
                         "tree (recovers a lost /tmp work dir without "
                         "re-measuring)")
    ap.add_argument("--dest", default=None,
                    help="render destination (default: the committed "
                         "results/parity_vs_reference — only written when "
                         "the summary holds harness runs, so rendering a "
                         "fresh work dir cannot clobber the committed table)")
    args = ap.parse_args()

    work = Path(args.work_dir)
    work.mkdir(parents=True, exist_ok=True)
    summary_path = work / "summary.json"
    summary = (
        json.loads(summary_path.read_text()) if summary_path.exists() else {"runs": []}
    )
    # merge measured-but-unrecorded draws from the round-2 variance study
    have = {(r["side"], r["fixture"], r.get("draw", 0)) for r in summary["runs"]}
    for prior in PRIOR_DRAWS:
        if (prior["side"], prior["fixture"], prior["draw"]) not in have:
            summary["runs"].append(dict(prior))
    if args.merge_artifacts:
        committed = REPO / "results" / "parity_vs_reference" / "artifacts"
        added = merge_artifacts(summary, committed)
        print(f"[merge-artifacts] reconstructed {len(added)} draw(s) from {committed}")
    if args.dest is not None:
        dest = Path(args.dest)
    elif any("source" not in r for r in summary["runs"]):  # harness runs carry no source tag
        dest = REPO / "results" / "parity_vs_reference"
    else:
        # fresh work dir: only auto-merged prior draws exist — rendering
        # those over the committed table would erase its harness runs
        dest = work
        print(f"no harness runs in {summary_path}; rendering to {dest} "
              "(pass --dest to override)")

    if args.render_only:
        render(summary, dest)
        return

    data_dir = work / "data"
    gen_fixtures(data_dir)

    done = {(r["side"], r["fixture"], r.get("draw", 0)) for r in summary["runs"]}
    for fixture in FIXTURES:
        if args.only and fixture["name"] != args.only:
            continue
        n_draws = args.draws or DRAW_TARGETS.get(fixture["name"], 1)
        for draw in range(n_draws):
            for side in ("reference", "vad_tpu"):
                if args.side and side != args.side:
                    continue
                if (side, fixture["name"], draw) in done:
                    print(f"[skip] {side}/{fixture['name']}/draw{draw} already done")
                    continue
                rec = run_side(side, fixture, data_dir, work, draw=draw)
                summary["runs"].append(rec)
                summary_path.write_text(json.dumps(summary, indent=2))
                print(f"[done] {side}/{fixture['name']}/draw{draw}: {rec}")

    render(summary, dest)
    # committed artifacts alongside the table — MERGE, never wipe: a
    # partial campaign from a fresh work dir holds only its own draws,
    # and replacing the committed tree wholesale would delete every
    # other fixture's artifacts.  But within a cell this campaign
    # touched, committed draw artifacts the summary no longer references
    # are SUPERSEDED (e.g. a cell re-measured post-procedure-fix at a
    # lower n) and must not survive: --merge-artifacts would otherwise
    # reconstruct those stale pre-fix draws straight back into a
    # post-fix summary — exactly the cross-procedure conflation
    # artifacts_superseded/README.md forbids.
    art_src = work / "artifacts"
    if art_src.exists():
        art_dst = dest / "artifacts"
        prune_superseded(summary, art_src, art_dst)
        shutil.copytree(art_src, art_dst, dirs_exist_ok=True)


if __name__ == "__main__":
    main()
