"""Torch-CPU baseline measurement for bench.py's vs_baseline ratio.

The reference publishes no throughput numbers (SURVEY §6), so the baseline
is measured here: a torch model with the reference's exact architecture
(models/video_autoencoder.py — per-frame conv encoder, 2-layer ConvLSTM
with a fused 4-gate conv per step, per-frame transposed-conv decoder),
scoring non-overlapping 16-frame windows on CPU, forward only.  This is
the reference's *best case* (its own --video mode re-scores every frame
sequence_length times), so vs_baseline is conservative.

The measurement is cached in BASELINE_MEASURED.json at the repo root.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

CACHE = Path(__file__).resolve().parents[2] / "BASELINE_MEASURED.json"


def _build_reference_equivalent_model():
    import torch
    import torch.nn as nn

    class Cell(nn.Module):
        def __init__(self, cin, ch):
            super().__init__()
            self.ch = ch
            self.conv = nn.Conv2d(cin + ch, 4 * ch, 3, padding=1)

        def forward(self, x, h, c):
            gates = self.conv(torch.cat([x, h], dim=1))
            i, f, g, o = torch.split(gates, self.ch, dim=1)
            c = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(g)
            h = torch.sigmoid(o) * torch.tanh(c)
            return h, c

    class RefVideoAE(nn.Module):
        def __init__(self, latent=128, hidden=128, layers=2):
            super().__init__()
            enc = []
            cin = 3
            for cout in (32, 64, 128, latent):
                enc += [
                    nn.Conv2d(cin, cout, 3, padding=1),
                    nn.BatchNorm2d(cout),
                    nn.LeakyReLU(0.2, inplace=True),
                    nn.MaxPool2d(2, 2),
                ]
                cin = cout
            self.encoder = nn.Sequential(*enc)
            self.cells = nn.ModuleList(
                [Cell(latent if i == 0 else hidden, hidden) for i in range(layers)]
            )
            dec = []
            cin = hidden
            for cout in (128, 64, 32):
                dec += [
                    nn.ConvTranspose2d(cin, cout, 2, stride=2),
                    nn.BatchNorm2d(cout),
                    nn.ReLU(inplace=True),
                ]
                cin = cout
            dec += [nn.ConvTranspose2d(cin, 3, 2, stride=2), nn.Tanh()]
            self.decoder = nn.Sequential(*dec)
            self.hidden = hidden

        def forward(self, x):  # [B, T, C, H, W]
            import torch

            b, t, c, h, w = x.shape
            z = self.encoder(x.reshape(b * t, c, h, w))
            zc, zh, zw = z.shape[1:]
            z = z.reshape(b, t, zc, zh, zw)
            cur = z
            for cell in self.cells:
                hs = torch.zeros(b, self.hidden, zh, zw)
                cs = torch.zeros(b, self.hidden, zh, zw)
                outs = []
                for ti in range(t):
                    hs, cs = cell(cur[:, ti], hs, cs)
                    outs.append(hs)
                cur = torch.stack(outs, dim=1)
            y = self.decoder(cur.reshape(b * t, self.hidden, zh, zw))
            return y.reshape(b, t, 3, h, w)

    return RefVideoAE()


def measure_reference_cpu_fps(
    image_size: int = 256,
    sequence_length: int = 16,
    n_windows: int = 10,
    force: bool = False,
) -> float:
    """Frames/sec of the reference-equivalent torch model on CPU (cached).

    Reports the BEST of ``n_windows`` single-window timings (the
    reference's most favourable steady state) so the cached denominator
    is not a thin average over a cold run.
    """
    if CACHE.exists() and not force:
        data = json.loads(CACHE.read_text())
        key = f"torch_cpu_fps_{image_size}_{sequence_length}"
        if key in data:
            return float(data[key])

    import torch

    torch.set_num_threads(max(torch.get_num_threads(), 1))
    model = _build_reference_equivalent_model().eval()
    x = torch.randn(1, sequence_length, 3, image_size, image_size)
    best = float("inf")
    with torch.no_grad():
        model(x)  # warm-up
        for _ in range(n_windows):
            t0 = time.time()
            model(x)
            best = min(best, time.time() - t0)
    fps = sequence_length / best

    data = json.loads(CACHE.read_text()) if CACHE.exists() else {}
    data[f"torch_cpu_fps_{image_size}_{sequence_length}"] = fps
    data["note"] = (
        "reference-equivalent torch model, CPU forward-only, non-overlapping "
        "windows (reference best case; its --video mode rescored every frame "
        "sequence_length times)"
    )
    CACHE.write_text(json.dumps(data, indent=2) + "\n")
    return fps


if __name__ == "__main__":
    print(measure_reference_cpu_fps(force=True))
