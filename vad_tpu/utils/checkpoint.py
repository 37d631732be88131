"""Self-describing single-file checkpoints.

Same contract as the reference's torch.save dicts (train.py:206-225):
a checkpoint carries {params, batch_stats, opt_state, epoch, train_loss,
val_loss, history, args, ...} and every consumer rebuilds the model purely
from the stored ``args`` (reference evaluate.py:31-36).  Arrays are stored
as host numpy inside a pickle — the same serialization family torch.save
uses — written atomically (tmp file + rename) so a crash mid-write never
corrupts the best checkpoint.

True resume is supported (the reference saves optimizer state but never
restores it — SURVEY §5.4): `load_checkpoint` returns opt_state intact.
"""

from __future__ import annotations

import pickle
import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

CHECKPOINT_SUFFIX = ".ckpt"


def _to_host(tree: Any) -> Any:
    """Device arrays -> host numpy, leaving python scalars alone."""
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )


def save_checkpoint(path: str | Path, payload: Dict[str, Any]) -> Path:
    """Atomically pickle a checkpoint dict (arrays converted to numpy)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(_to_host(payload), f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)
    return path


def load_checkpoint(path: str | Path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def rotate_epoch_checkpoints(results_dir: str | Path, keep: int) -> int:
    """Delete all but the newest ``keep`` per-epoch checkpoints
    (``--keep-checkpoints``; best/final checkpoints are never touched).
    The reference keeps every epoch's checkpoint (train_video.py:257-262),
    which at ~10 MB per epoch fills a disk on long production retrains —
    keeping the default at 0 (= keep all) preserves that behavior.
    Returns the number of files removed."""
    if keep <= 0:  # documented contract: 0 (or less) = keep all
        return 0
    results_dir = Path(results_dir)
    epochs = []
    for p in results_dir.glob(f"checkpoint_epoch_*{CHECKPOINT_SUFFIX}"):
        m = re.search(r"checkpoint_epoch_(\d+)", p.name)
        if m:
            epochs.append((int(m.group(1)), p))
    epochs.sort()
    removed = 0
    for _, p in epochs[: max(0, len(epochs) - keep)]:
        p.unlink(missing_ok=True)
        removed += 1
    return removed


def latest_checkpoint(results_dir: str | Path) -> Optional[Path]:
    """Newest per-epoch checkpoint in a run dir (for resume), else None."""
    results_dir = Path(results_dir)
    best: tuple[int, Optional[Path]] = (-1, None)
    for p in results_dir.glob(f"checkpoint_epoch_*{CHECKPOINT_SUFFIX}"):
        m = re.search(r"checkpoint_epoch_(\d+)", p.name)
        if m and int(m.group(1)) > best[0]:
            best = (int(m.group(1)), p)
    return best[1]
