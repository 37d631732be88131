"""Minimal torchvision stand-in for running the reference implementation.

The parity harness (tools/parity/run_parity.py) executes the UNMODIFIED
reference code at /root/reference for a head-to-head accuracy comparison,
but this image has no torchvision wheel.  The reference only touches
``transforms.{Compose, Resize, ToTensor, Normalize}`` on PIL images
(reference utils/dataset.py:65-77, utils/video_dataset.py:61-66, 190-195,
356-360), so this package provides exactly that surface backed by PIL +
numpy + torch.  It is test infrastructure, not part of vad_tpu.
"""

from . import transforms  # noqa: F401
