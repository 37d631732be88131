"""Lockstep training-trajectory parity: torch reference vs vad_tpu.

The parity table (results/parity_vs_reference) established that the two
frameworks' EVAL stacks agree exactly (checkpoint cross-evaluation,
VARIANCE.md) — any AUROC gap must come from the training trajectories.
This experiment pins down whether the trajectories themselves differ
systematically: both frameworks start from the IDENTICAL initialization
(the torch init imported through vad_tpu.utils.torch_import), train on
the IDENTICAL fixed batch with the textured fixture's exact loss/optimizer
config (combined 0.5*MSE + 0.5*SSIM, Adam lr=1e-3 wd=1e-5, train-mode
BatchNorm), and record the per-step loss curves.

What each number isolates:

- step-0 loss difference  -> forward + loss implementation parity
  (train-mode BN, LeakyReLU, ConvTranspose geometry, SSIM constants);
- first-step loss drop difference -> gradient + Adam-update parity
  (bias correction, eps placement, torch-style weight decay);
- late-step envelope -> whether both optimizers converge at the same
  rate.  NOTE: the two frameworks round differently inside convolutions,
  so trajectories on a chaotic loss surface separate exponentially —
  pointwise equality is only expected for the first few steps; after
  that the honest comparison is the curve envelope.

Runs entirely on CPU (torch has no other option here; JAX is forced off
the TPU so this can run while the chip is busy).  Reference modules are
loaded from /root/reference with the same torchvision shim the parity
harness uses (tools/parity/shims).

Usage:
    python tools/trajectory_parity.py --data-dir /tmp/parity/data \
        [--steps 80] [--image-size 128]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
REFERENCE = Path("/root/reference")
SHIMS = REPO / "tools" / "parity" / "shims"
RECORD = REPO / "results" / "experiments" / "trajectory_parity.md"

sys.path.insert(0, str(REPO))  # vad_tpu imports when run from anywhere


def load_batch(data_dir: Path, image_size: int, batch: int = 16) -> np.ndarray:
    """First `batch` textured train images -> float32 [-1,1] NHWC array.

    Both frameworks consume this exact array (the torch side transposes
    to NCHW), so file decode / resize cannot contribute any difference.
    """
    from PIL import Image

    files = sorted((data_dir / "textured" / "train" / "good").glob("*.png"))[:batch]
    if len(files) < batch:
        raise SystemExit(f"need {batch} textured train images under {data_dir}")
    imgs = [
        np.asarray(
            Image.open(f).convert("RGB").resize((image_size, image_size), Image.BILINEAR),
            dtype=np.float32,
        )
        for f in files
    ]
    return np.stack(imgs) / 127.5 - 1.0  # [B, H, W, 3]


def run_torch(x_nhwc: np.ndarray, steps: int, lr: float, wd: float):
    """Reference model: init (seed 0), train-mode lockstep on the fixed batch.

    Returns (initial state_dict as numpy, loss curve).
    """
    sys.path.insert(0, str(SHIMS))
    sys.path.insert(0, str(REFERENCE))
    import torch

    from models.autoencoder import ConvAutoencoder  # reference module
    from utils.losses import CombinedLoss  # reference module

    torch.manual_seed(0)
    model = ConvAutoencoder(in_channels=3, latent_dim=256)
    sd0 = {k: v.detach().cpu().numpy().copy() for k, v in model.state_dict().items()}

    x = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
    criterion = CombinedLoss(alpha=0.5)
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=wd)
    model.train()
    losses = []
    for _ in range(steps):
        opt.zero_grad()
        recon = model(x)
        loss = criterion(recon, x)
        loss.backward()
        opt.step()
        losses.append(float(loss.item()))
    return sd0, losses


def run_vad(sd0: dict, x_nhwc: np.ndarray, steps: int, lr: float, wd: float,
            perturb: float = 0.0):
    """vad_tpu: same init (imported), same batch, the REAL train step.

    ``perturb``: multiply every parameter by (1 + perturb) before training —
    the chaos control.  A float-rounding-scale perturbation (1e-6) of the
    SAME framework quantifies how fast this loss surface amplifies
    round-off; the torch-vs-vad late-step gap is only meaningful if it
    exceeds that self-divergence.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")  # TPU may be busy; CPU suffices
    import jax.numpy as jnp

    from vad_tpu.models.autoencoder import ConvAutoencoder
    from vad_tpu.ops.losses import make_per_sample_loss_fn
    from vad_tpu.train.state import create_train_state
    from vad_tpu.train.steps import make_train_step
    from vad_tpu.utils.torch_import import import_image_state_dict

    params, stats = import_image_state_dict(sd0)
    if perturb:
        params = jax.tree.map(lambda p: p * (1.0 + perturb), params)
    model = ConvAutoencoder(in_channels=3, latent_dim=256)
    state = create_train_state(
        model, {"params": params, "batch_stats": stats}, lr, weight_decay=wd
    )
    step = make_train_step(make_per_sample_loss_fn("combined", 0.5))
    x = jnp.asarray(x_nhwc)
    n_real = jnp.asarray(x.shape[0], jnp.int32)
    losses = []
    for _ in range(steps):
        state, loss = step(state, x, n_real)
        losses.append(float(loss))
    return losses


def render(result: dict) -> None:
    t = result["torch_losses"]
    v = result["vad_losses"]
    c = result.get("vad_control_losses")
    n = len(t)
    lines = [
        "# Lockstep trajectory parity: torch reference vs vad_tpu (round 4)",
        "",
        "Same initialization (torch seed-0 init imported through",
        "vad_tpu.utils.torch_import), same fixed 16-image textured batch,",
        "same config as the textured parity fixture (combined 0.5 MSE +",
        "0.5 SSIM, Adam lr=1e-3, torch-style wd=1e-5, train-mode BN),",
        f"{n} steps, both on CPU.  Eval parity is already exact",
        "(VARIANCE.md checkpoint cross-evaluation); this isolates the",
        "TRAINING math.",
        "",
        "| quantity | torch | vad_tpu | abs diff |",
        "|---|---|---|---|",
        f"| loss at step 1 (forward+loss parity) | {t[0]:.6f} | {v[0]:.6f} "
        f"| {abs(t[0]-v[0]):.2e} |",
        f"| loss at step 2 (one optimizer update) | {t[1]:.6f} | {v[1]:.6f} "
        f"| {abs(t[1]-v[1]):.2e} |",
        f"| loss at step 5 | {t[4]:.6f} | {v[4]:.6f} | {abs(t[4]-v[4]):.2e} |",
        f"| loss at step 10 | {t[9]:.6f} | {v[9]:.6f} | {abs(t[9]-v[9]):.2e} |",
        f"| mean loss, last 10 steps | {np.mean(t[-10:]):.6f} "
        f"| {np.mean(v[-10:]):.6f} | {abs(np.mean(t[-10:])-np.mean(v[-10:])):.2e} |",
        f"| min loss reached | {min(t):.6f} | {min(v):.6f} "
        f"| {abs(min(t)-min(v)):.2e} |",
        "",
        "Interpretation contract (written before the numbers existed):",
        "step-1 agreement to ~1e-5 proves the forward pass, train-mode BN,",
        "and the combined loss are the same function; step-2 agreement",
        "proves gradients + Adam + weight-decay placement match; the two",
        "frameworks round differently inside convs, so later pointwise",
        "divergence is expected chaos — the meaningful late-step comparison",
        "is that both envelopes descend at the same rate to the same floor.",
    ]
    if c is not None:
        lines += [
            "",
            "## Chaos control: the same framework against itself",
            "",
            "vad_tpu rerun with every parameter multiplied by (1 + 1e-6) —",
            "a float-rounding-scale perturbation inside ONE framework, so any",
            "spread between this run and the unperturbed vad run is pure",
            "trajectory chaos, with zero implementation difference:",
            "",
            "| quantity | vad_tpu | vad_tpu perturbed 1e-6 | spread "
            "| torch-vad gap |",
            "|---|---|---|---|---|",
            f"| loss at step 10 | {v[9]:.6f} | {c[9]:.6f} "
            f"| {abs(v[9]-c[9]):.2e} | {abs(t[9]-v[9]):.2e} |",
            f"| mean loss, last 10 steps | {np.mean(v[-10:]):.6f} "
            f"| {np.mean(c[-10:]):.6f} | {abs(np.mean(v[-10:])-np.mean(c[-10:])):.2e} "
            f"| {abs(np.mean(t[-10:])-np.mean(v[-10:])):.2e} |",
            f"| max over all steps | — | — "
            f"| {max(abs(a-b) for a, b in zip(v, c)):.2e} "
            f"| {max(abs(a-b) for a, b in zip(t, v)):.2e} |",
            "",
            "If the torch-vad gap never exceeds the same-framework",
            "self-divergence, the lockstep shows NO systematic training",
            "difference: everything past the first few steps is rounding",
            "chaos that the multi-draw parity protocol",
            "(results/parity_vs_reference) already averages over.",
        ]
    lines += [
        "",
        "Full curves: trajectory_parity.json next to this file.",
        f"Reproduce: `python tools/trajectory_parity.py --data-dir "
        f"{result['data_dir']} --steps {n} --image-size {result['image_size']}`.",
        "",
    ]
    RECORD.parent.mkdir(parents=True, exist_ok=True)
    RECORD.write_text("\n".join(lines))
    (RECORD.parent / "trajectory_parity.json").write_text(
        json.dumps(result, indent=2) + "\n"
    )
    print(f"wrote {RECORD}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/parity/data")
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--wd", type=float, default=1e-5)
    args = ap.parse_args()

    x = load_batch(Path(args.data_dir), args.image_size)
    # cache the torch half so a crash/rerun on the vad side is cheap
    cache = Path(f"/tmp/traj_torch_{args.image_size}_{args.steps}.npz")
    if cache.exists():
        blob = np.load(cache, allow_pickle=False)
        t_losses = [float(v) for v in blob["losses"]]
        sd0 = {k: blob[f"sd.{k}"] for k in blob["keys"]}
        print(f"[torch] cached: first {t_losses[0]:.6f} last {t_losses[-1]:.6f}",
              flush=True)
    else:
        print(f"[torch] {args.steps} lockstep steps", flush=True)
        sd0, t_losses = run_torch(x, args.steps, args.lr, args.wd)
        np.savez(
            cache, losses=np.asarray(t_losses), keys=np.asarray(list(sd0)),
            **{f"sd.{k}": v for k, v in sd0.items()},
        )
        print(f"[torch] done: first {t_losses[0]:.6f} last {t_losses[-1]:.6f}",
              flush=True)
    print(f"[vad] {args.steps} lockstep steps", flush=True)
    v_losses = run_vad(sd0, x, args.steps, args.lr, args.wd)
    print(f"[vad] done: first {v_losses[0]:.6f} last {v_losses[-1]:.6f}", flush=True)
    print(f"[vad control] {args.steps} steps, params * (1 + 1e-6)", flush=True)
    c_losses = run_vad(sd0, x, args.steps, args.lr, args.wd, perturb=1e-6)
    print(f"[vad control] done: last {c_losses[-1]:.6f}", flush=True)
    render({
        "data_dir": args.data_dir,
        "image_size": args.image_size,
        "steps": args.steps,
        "lr": args.lr,
        "wd": args.wd,
        "torch_losses": t_losses,
        "vad_losses": v_losses,
        "vad_control_losses": c_losses,
    })


if __name__ == "__main__":
    main()
