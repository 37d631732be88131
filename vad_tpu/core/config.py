"""Model / training configuration dataclasses.

The reference persists `vars(args)` inside every checkpoint and every
consumer rebuilds the model from it (reference evaluate.py:31-36,
main.py:133-144).  We keep the same self-describing property: configs are
plain dataclasses that round-trip through dicts, and the checkpoint stores
the dict under the same ``args`` key with the same key names as the
reference CLI flags, so tooling written against the reference layout keeps
working.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict


@dataclass(frozen=True)
class ImageAEConfig:
    """Image conv-autoencoder hyperparameters.

    Mirrors reference models/autoencoder.py:34-139 (channels 3->32->64->128
    ->latent, spatial 256->16, decoder transposed-conv mirror ending in
    tanh).  1,546,147 parameters at defaults.
    """

    in_channels: int = 3
    latent_dim: int = 256
    image_size: int = 256
    norm: str = "batch"  # 'group': per-sample stats (models/norms.py)
    stem: str = "pool"  # 'stride2': TPU-first downsampling (models/autoencoder.py)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_args(cls, args: Dict[str, Any]) -> "ImageAEConfig":
        return cls(
            in_channels=int(args.get("in_channels", 3)),
            latent_dim=int(args.get("latent_dim", 256)),
            image_size=int(args.get("image_size", 256)),
            norm=str(args.get("norm", "batch")),
            stem=str(args.get("stem", "pool")),
        )


@dataclass(frozen=True)
class VideoAEConfig:
    """ConvLSTM video-autoencoder hyperparameters.

    Mirrors reference models/video_autoencoder.py:279-312 (per-frame
    encoder 3->32->64->128->latent, 2-layer ConvLSTM with 3x3 gate conv,
    optional 1x1 projection, per-frame transposed-conv decoder ending in
    tanh).  2,709,411 parameters at defaults.
    """

    in_channels: int = 3
    latent_dim: int = 128
    lstm_hidden_dim: int = 128
    lstm_layers: int = 2
    image_size: int = 256
    sequence_length: int = 16
    norm: str = "batch"  # 'group': per-sample stats (models/norms.py)
    stem: str = "pool"  # 'stride2': TPU-first downsampling (models/video_autoencoder.py)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_args(cls, args: Dict[str, Any]) -> "VideoAEConfig":
        return cls(
            in_channels=int(args.get("in_channels", 3)),
            latent_dim=int(args.get("latent_dim", 128)),
            lstm_hidden_dim=int(args.get("lstm_hidden_dim", 128)),
            lstm_layers=int(args.get("lstm_layers", 2)),
            image_size=int(args.get("image_size", 256)),
            sequence_length=int(args.get("sequence_length", 16)),
            norm=str(args.get("norm", "batch")),
            stem=str(args.get("stem", "pool")),
        )
