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

Results accumulate in <work-dir>/summary.json (resumable: completed
(side, fixture) pairs are skipped) and are rendered into
results/parity_vs_reference/README.md by --render.
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


def run(cmd, cwd, env_extra=None, check=True) -> tuple[str, float, int]:
    import os

    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    t0 = time.perf_counter()
    proc = subprocess.run(
        cmd, cwd=cwd, env=env, check=check,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
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


def run_side(side: str, fixture: dict, data_dir: Path, out_dir: Path) -> dict:
    kind = fixture["kind"]
    train_script = "train_video.py" if kind == "video" else "train.py"
    eval_script = "evaluate_video.py" if kind == "video" else "evaluate.py"
    if side == "reference":
        cwd, ckpt_name = REFERENCE, "best_model.pth"
        env = {"PYTHONPATH": f"{SHIMS}:/root/.axon_site"}
        extra = ["--num-workers", "0"]
    else:
        cwd, ckpt_name = REPO, "best_model.ckpt"
        env = None
        extra = ["--seed", "0"]

    results_dir = out_dir / side
    results_dir.mkdir(parents=True, exist_ok=True)
    train_cmd = [
        sys.executable, train_script, *fixture["flags"], *extra,
        "--data-dir", str(data_dir), "--results-dir", str(results_dir),
    ]
    print(f"[{side}/{fixture['name']}] training: {' '.join(train_cmd)}", flush=True)
    stdout, train_s, _ = run(train_cmd, cwd, env)
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
    eval_out, eval_s, eval_rc = run(eval_cmd, cwd, env, check=False)
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
        "train_seconds": round(train_s, 1),
        "eval_seconds": round(eval_s, 1),
        "run_dir": str(run_dir),
        **parse_aurocs(kind, results_txt, eval_out),
    }
    # keep the artifact for the committed table
    keep = out_dir / "artifacts" / side / fixture["name"]
    keep.mkdir(parents=True, exist_ok=True)
    shutil.copy2(results_txt, keep / "results.txt")
    return rec


def render(summary: dict, dest: Path) -> None:
    by = {(r["side"], r["fixture"]): r for r in summary["runs"]}
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
        "    python tools/parity/run_parity.py --work-dir /tmp/parity",
        "",
        "| Fixture | Budget | reference AUROC | vad_tpu AUROC | ref train s | vad train s |",
        "|---|---|---|---|---|---|",
    ]
    budgets = {
        "synthetic": "50 ep, 256px, mse",
        "textured": "50 ep, 256px, combined",
        "video_synthetic": "15 ep, 128px, T=8",
        "textured_video": "15 ep, 128px, T=8",
    }
    for f in FIXTURES:
        ref = by.get(("reference", f["name"]))
        vad = by.get(("vad_tpu", f["name"]))
        if not (ref and vad):
            continue
        mark = " ✓" if vad["auroc"] >= ref["auroc"] else " ✗"
        lines.append(
            f"| {f['name']} | {budgets[f['name']]} | {ref['auroc']:.4f} | "
            f"{vad['auroc']:.4f}{mark} | {ref['train_seconds']:.0f} | "
            f"{vad['train_seconds']:.0f} |"
        )
    frame_rows = [
        (f["name"], by.get(("reference", f["name"])), by.get(("vad_tpu", f["name"])))
        for f in FIXTURES if f["kind"] == "video"
    ]
    frame_rows = [
        (n, r, v) for n, r, v in frame_rows
        if r and v and ("frame_auroc" in r or "frame_auroc" in v)
    ]
    if frame_rows:
        lines += ["", "Frame-level AUROC (video fixtures):", "",
                  "| Fixture | reference | vad_tpu |", "|---|---|---|"]
        for n, r, v in frame_rows:
            rf = f"{r['frame_auroc']:.4f}" if "frame_auroc" in r else "—"
            vf = f"{v['frame_auroc']:.4f}" if "frame_auroc" in v else "—"
            lines.append(f"| {n} | {rf} | {vf} |")
    lines += [
        "",
        "Wall-clock columns are full training runs (same epochs both sides):",
        "reference on the host CPU, vad_tpu on one TPU chip through a remote",
        "tunnel. Raw results.txt files from both sides are committed next to",
        "this file. Caveats: the reference has no seeding (its numbers vary",
        "run to run); fixtures are synthetic, not MVTec.",
        "",
        "Run-to-run variance for both sides and a train-vs-eval decomposition",
        "via checkpoint interop are in [VARIANCE.md](VARIANCE.md).",
    ]
    dest.mkdir(parents=True, exist_ok=True)
    (dest / "README.md").write_text("\n".join(lines) + "\n")
    print(f"wrote {dest / 'README.md'}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/parity")
    ap.add_argument("--only", default=None, help="fixture name filter")
    ap.add_argument("--side", default=None, choices=["reference", "vad_tpu"])
    ap.add_argument("--render-only", action="store_true")
    args = ap.parse_args()

    work = Path(args.work_dir)
    work.mkdir(parents=True, exist_ok=True)
    summary_path = work / "summary.json"
    summary = (
        json.loads(summary_path.read_text()) if summary_path.exists() else {"runs": []}
    )
    dest = REPO / "results" / "parity_vs_reference"

    if args.render_only:
        render(summary, dest)
        return

    data_dir = work / "data"
    gen_fixtures(data_dir)

    done = {(r["side"], r["fixture"]) for r in summary["runs"]}
    for fixture in FIXTURES:
        if args.only and fixture["name"] != args.only:
            continue
        for side in ("reference", "vad_tpu"):
            if args.side and side != args.side:
                continue
            if (side, fixture["name"]) in done:
                print(f"[skip] {side}/{fixture['name']} already done")
                continue
            rec = run_side(side, fixture, data_dir, work)
            summary["runs"].append(rec)
            summary_path.write_text(json.dumps(summary, indent=2))
            print(f"[done] {side}/{fixture['name']}: {rec}")

    render(summary, dest)
    # committed artifacts alongside the table
    art_src = work / "artifacts"
    if art_src.exists():
        art_dst = dest / "artifacts"
        if art_dst.exists():
            shutil.rmtree(art_dst)
        shutil.copytree(art_src, art_dst)


if __name__ == "__main__":
    main()
