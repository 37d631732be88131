"""PIL-backed implementations of the four transforms the reference uses.

Semantics match torchvision's classic (PIL-input) transforms:
- Resize: PIL bilinear resample to (h, w).
- ToTensor: HWC uint8 [0,255] -> CHW float32 [0,1] torch tensor
  (single-channel images become [1, H, W]).
- Normalize: per-channel (x - mean) / std.
"""

from __future__ import annotations

import numpy as np
import torch
from PIL import Image


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class Resize:
    def __init__(self, size, interpolation=None):
        self.size = size if isinstance(size, (tuple, list)) else (size, size)

    def __call__(self, img: Image.Image) -> Image.Image:
        h, w = self.size
        return img.resize((w, h), Image.BILINEAR)


class ToTensor:
    def __call__(self, img) -> torch.Tensor:
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[None]
        else:
            arr = arr.transpose(2, 0, 1)
        return torch.from_numpy(np.ascontiguousarray(arr))


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(list(mean), dtype=torch.float32).view(-1, 1, 1)
        self.std = torch.tensor(list(std), dtype=torch.float32).view(-1, 1, 1)

    def __call__(self, t: torch.Tensor) -> torch.Tensor:
        return (t - self.mean) / self.std
