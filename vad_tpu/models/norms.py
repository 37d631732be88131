"""Normalization-layer selection shared by both model families.

The reference hard-codes BatchNorm (autoencoder.py:40,
video_autoencoder.py:196).  BatchNorm couples samples through batch
statistics, which has one failure mode in this framework: when a dataset
is smaller than one batch, the static-shape padding duplicates samples
into the train-mode statistics (train/steps.py masks the LOSS but cannot
mask the normalizer).  ``norm='group'`` swaps every BatchNorm for a
GroupNorm — per-sample statistics, so padded rows cannot perturb real
ones, no running-stats state, and identical behavior between train and
eval mode.  Default stays ``'batch'`` for reference parity.
"""

from __future__ import annotations

import flax.linen as nn

NORM_KINDS = ("batch", "group")


def make_norm(kind: str, train: bool, name: str | None = None) -> nn.Module:
    """One normalization layer: 'batch' (reference parity) or 'group'.

    ``name``: optional base name; 'batch' layers are named
    ``BatchNorm_<name>``-style by the caller where param-tree stability
    matters (e.g. VideoEncoder's skip-first-block entry point).
    """
    if kind == "batch":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)
    if kind == "group":
        # 8 groups divides every channel width used by the two model
        # families (32/64/128/256); per-channel affine like BatchNorm.
        return nn.GroupNorm(num_groups=8, name=name)
    raise ValueError(f"unknown norm {kind!r}; expected one of {NORM_KINDS}")
