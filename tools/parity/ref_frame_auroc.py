"""Frame-level AUROC for a REFERENCE video checkpoint (out-of-band).

The reference's dataset-mode eval has a frame-level AUROC branch
(reference evaluate_video.py:149-153, 171-176) that is DEAD CODE for
IPAD data: `IPADDataset._load_dataset` stores per-frame labels on every
test sequence (video_dataset.py:102-111, 128), but `__getitem__` never
returns them (video_dataset.py:145-151), so `'frame_labels' in batch`
is always False and the reference only ever reports sequence-level
AUROC.  The parity table's reference frame-level cells were "—" for
exactly this reason (round-4 VERDICT missing #3).

This tool computes the number the reference WOULD have printed, using
only reference code for everything that matters:

- the reference `VideoAutoencoder` rebuilt from the checkpoint's saved
  args and weights (same logic as evaluate_video.py:82-107);
- the reference `IPADDataset` test split at stride=sequence_length
  (the eval's non-overlapping windowing, evaluate_video.py:117);
- per-frame scores from the reference's own
  `get_reconstruction_error(per_frame=True)` (evaluate_video.py:151);
- frame labels read from the dataset's internal
  `sequences[i]['frame_labels']` — the very labels the reference's
  `__getitem__` drops on the floor.

Only the label plumbing is harness code; the model math, windowing,
and scoring are the reference's.  Run with the parity harness's env
(PYTHONPATH=tools/parity/shims) on CPU.

Usage:
    python tools/parity/ref_frame_auroc.py --checkpoint <best_model.pth>
        --data-dir <fixture data dir> [--category T01] [--batch-size 4]

Prints `Frame-level AUROC: X.XXXX` (the harness parses this line).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REFERENCE = Path("/root/reference")
SHIMS = Path(__file__).resolve().parent / "shims"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--category", default=None)
    ap.add_argument("--batch-size", type=int, default=4)
    args = ap.parse_args()

    sys.path.insert(0, str(SHIMS))
    sys.path.insert(0, str(REFERENCE))
    import numpy as np
    import torch
    from sklearn.metrics import roc_auc_score

    from models.video_autoencoder import VideoAutoencoder  # reference
    from utils.video_dataset import IPADDataset  # reference

    device = torch.device("cpu")
    ckpt = torch.load(args.checkpoint, map_location=device, weights_only=False)
    saved = ckpt.get("args", {})
    model = VideoAutoencoder(
        in_channels=3,
        latent_dim=saved.get("latent_dim", 128),
        lstm_hidden_dim=saved.get("lstm_hidden_dim", 128),
        lstm_num_layers=saved.get("lstm_layers", 2),
    )
    model.load_state_dict(ckpt["model_state_dict"])
    model.eval()

    seq_len = saved.get("sequence_length", 16)
    ds = IPADDataset(
        root_dir=args.data_dir,
        category=args.category or saved.get("category", "S01"),
        split="test",
        sequence_length=seq_len,
        stride=seq_len,  # the eval's non-overlapping windows
        image_size=saved.get("image_size", 256),
    )

    scores, labels = [], []
    with torch.no_grad():
        for start in range(0, len(ds), args.batch_size):
            idxs = range(start, min(start + args.batch_size, len(ds)))
            frames = torch.stack([ds[i]["frames"] for i in idxs], dim=0)
            frame_err = model.get_reconstruction_error(frames, per_frame=True)
            for j, i in enumerate(idxs):
                fl = ds.sequences[i]["frame_labels"]
                if fl is None:
                    continue
                scores.extend(frame_err[j].cpu().numpy().tolist())
                labels.extend(np.asarray(fl).tolist())

    scores = np.asarray(scores)
    labels = np.asarray(labels)
    if len(labels) == 0 or len(np.unique(labels)) < 2:
        print("Cannot compute frame-level AUROC - labels missing or one-class")
        return
    print(f"Frames scored: {len(labels)} ({int(labels.sum())} anomalous)")
    print(f"Frame-level AUROC: {roc_auc_score(labels, scores):.4f}")


if __name__ == "__main__":
    main()
