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
