"""Self-describing single-file checkpoints.

Same contract as the reference's torch.save dicts (train.py:206-225):
a checkpoint carries {params, batch_stats, opt_state, epoch, train_loss,
val_loss, history, args, ...} and every consumer rebuilds the model purely
from the stored ``args`` (reference evaluate.py:31-36).  Arrays are stored
as host numpy inside a pickle — the same serialization family torch.save
uses — written atomically (tmp file + rename) so a crash mid-write never
corrupts the best checkpoint.

LOADING IS CODE-EXECUTION SAFE.  A bare ``pickle.load`` is an RCE
primitive (a crafted file runs arbitrary code on load — the reference
inherits exactly this via ``torch.load``, evaluate.py:31), which is
unacceptable on a serving daemon that hot-reloads files named by
clients (``POST /v1/reload``) or found on disk (``serve.py --watch``).
``load_checkpoint`` therefore deserializes through a restricted
Unpickler that resolves ONLY the globals a real checkpoint needs:
numpy array reconstruction and the optax optimizer-state namedtuples.
Anything else (``os.system``, ``subprocess``, ``builtins.eval``, any
``__reduce__`` payload) raises ``pickle.UnpicklingError`` before a
byte of it is interpreted.  Old checkpoints load unchanged — they only
ever contained these types — so back-compat is total.

True resume is supported (the reference saves optimizer state but never
restores it — SURVEY §5.4): `load_checkpoint` returns opt_state intact.
"""

from __future__ import annotations

import importlib
import io
import pickle
import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

CHECKPOINT_SUFFIX = ".ckpt"

# (module, name) pairs a checkpoint pickle may resolve.  Everything here
# is data reconstruction: numpy's array/scalar rebuilders and the optax
# state namedtuples (plain tuples with field names — constructing one
# executes no user code).  numpy<2 spells its private modules
# ``numpy.core``; numpy>=2 spells them ``numpy._core`` — both are
# allowed so checkpoints written under either load under either.
_SAFE_GLOBALS = {
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "scalar"),
    ("numpy.core.numeric", "_frombuffer"),
    ("numpy._core.numeric", "_frombuffer"),
    # optax optimizer-state namedtuples (train/state.py's chain):
    # add_decayed_weights -> EmptyState, scale_by_adam -> ScaleByAdamState,
    # inject_hyperparams wrapper state (name moved across optax versions)
    ("optax._src.base", "EmptyState"),
    ("optax._src.transform", "ScaleByAdamState"),
    ("optax._src.inject", "InjectHyperparamsState"),
    ("optax.schedules._inject", "InjectHyperparamsState"),
    ("optax.schedules._inject", "InjectStatefulHyperparamsState"),
}


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str):  # noqa: D102
        if (module, name) not in _SAFE_GLOBALS:
            raise pickle.UnpicklingError(
                f"checkpoint references disallowed global {module}.{name}; "
                f"refusing to load (checkpoints may only contain numpy "
                f"arrays, optax states, and plain python data)"
            )
        return getattr(importlib.import_module(module), name)


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
    """Deserialize a checkpoint WITHOUT the ability to execute code.

    See the module docstring: only numpy / optax-state / builtin data
    globals resolve; a crafted pickle raises ``pickle.UnpicklingError``
    instead of running its payload."""
    with open(path, "rb") as f:
        return _RestrictedUnpickler(f).load()


def load_checkpoint_bytes(data: bytes) -> Dict[str, Any]:
    """`load_checkpoint` over an in-memory buffer (same restrictions)."""
    return _RestrictedUnpickler(io.BytesIO(data)).load()


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
