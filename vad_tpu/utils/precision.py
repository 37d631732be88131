"""Precision policy helpers.

TPU MXU throughput doubles in bfloat16 and HBM traffic halves; the scoring
path tolerates bf16 (relative score shifts <1%, validated in
tests/test_pallas_convlstm.py and tests/test_serving.py).  Training and
AUROC-parity evaluation stay f32; the ConvLSTM cell state stays f32 even
under a bf16 policy (it integrates across the whole sequence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype`` (ints untouched)."""

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree.map(cast, tree)


def checked_cast_like(variables, reference, dtype):
    """Cast ``variables`` to the serving ``dtype`` and verify they match
    ``reference``'s pytree structure, shapes, and dtypes exactly.

    The hot-reload contract (serving.MultiStreamScorer.reload_variables,
    http_server.ImageScoringService.reload): identical structure means
    the already-compiled device step is reused.  Raises ValueError on any
    mismatch — shared by both reload paths so the check cannot diverge.
    """
    new = cast_floating(variables, dtype) if dtype != jnp.float32 else variables
    old_shapes = jax.tree.map(lambda a: (a.shape, str(a.dtype)), reference)
    new_shapes = jax.tree.map(lambda a: (a.shape, str(a.dtype)), new)
    if old_shapes != new_shapes:
        raise ValueError(
            "checkpoint does not match the served architecture "
            "(pytree/shape/dtype mismatch); restart the server to "
            "change architectures"
        )
    return new


def check_served_image_size(ckpt_args: dict, served) -> None:
    """Reject a hot-reload whose checkpoint was trained at a different
    resolution: fully-convolutional weights pass the structural check at
    ANY image_size, so without this guard a retrain at a new resolution
    would swap in silently and serve meaningless scores on frames of the
    old size.  ``served`` is an int or (H, W)."""
    ck = ckpt_args.get("image_size")
    if ck is None:
        return  # old/torch-imported checkpoints carry no args: allow
    hw = tuple(served) if isinstance(served, (tuple, list)) else (served, served)
    if (int(ck), int(ck)) != (int(hw[0]), int(hw[1])):
        raise ValueError(
            f"checkpoint was trained at image_size={ck} but the server "
            f"is compiled for {hw}; restart the server to change resolutions"
        )


def check_served_stem(ckpt_args: dict, served_stem: str) -> None:
    """Reject a hot-reload across encoder stems: 'pool' and 'stride2'
    checkpoints have IDENTICAL parameter trees (same 3x3 kernels, the
    pool has no parameters), so the structural check cannot tell them
    apart — but they are different functions, and serving stride2
    weights through a pool-compiled step would score garbage silently."""
    ck = str(ckpt_args.get("stem", "pool"))
    if ck != str(served_stem or "pool"):
        raise ValueError(
            f"checkpoint was trained with --stem {ck} but the server is "
            f"compiled for the '{served_stem}' stem (identical parameter "
            "shapes, different function); restart the server to change stems"
        )
