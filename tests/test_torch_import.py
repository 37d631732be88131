"""Torch-checkpoint importer tests.

Builds torch models with the reference's exact module structure/naming
(state_dict keys like `encoder.enc1.0.weight`, `convlstm.cells.0.conv.weight`),
randomizes them, imports into the Flax models, and asserts forward
equivalence on random inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vad_tpu.models.autoencoder import ConvAutoencoder  # noqa: E402
from vad_tpu.models.video_autoencoder import VideoAutoencoder  # noqa: E402
from vad_tpu.utils.torch_import import (  # noqa: E402
    detect_model_type,
    import_image_state_dict,
    import_torch_checkpoint,
    import_video_state_dict,
)


def _enc_block(cin, cout):
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, 3, padding=1), tnn.BatchNorm2d(cout), tnn.LeakyReLU(0.2),
        tnn.Conv2d(cout, cout, 3, padding=1), tnn.BatchNorm2d(cout), tnn.LeakyReLU(0.2),
        tnn.MaxPool2d(2, 2),
    )


def _dec_block(cin, cout):
    return tnn.Sequential(
        tnn.ConvTranspose2d(cin, cout, 2, stride=2), tnn.BatchNorm2d(cout), tnn.ReLU(),
        tnn.Conv2d(cout, cout, 3, padding=1), tnn.BatchNorm2d(cout), tnn.ReLU(),
    )


class TorchImageOracle(tnn.Module):
    """Same structure + attribute naming as reference models/autoencoder.py."""

    def __init__(self, latent=64):
        super().__init__()
        enc = tnn.Module()
        enc.enc1 = _enc_block(3, 32)
        enc.enc2 = _enc_block(32, 64)
        enc.enc3 = _enc_block(64, 128)
        enc.enc4 = _enc_block(128, latent)
        dec = tnn.Module()
        dec.dec1 = _dec_block(latent, 128)
        dec.dec2 = _dec_block(128, 64)
        dec.dec3 = _dec_block(64, 32)
        dec.dec4 = tnn.Sequential(
            tnn.ConvTranspose2d(32, 32, 2, stride=2), tnn.BatchNorm2d(32), tnn.ReLU(),
            tnn.Conv2d(32, 3, 3, padding=1), tnn.Tanh(),
        )
        self.encoder = enc
        self.decoder = dec

    def forward(self, x):
        for blk in (self.encoder.enc1, self.encoder.enc2, self.encoder.enc3, self.encoder.enc4,
                    self.decoder.dec1, self.decoder.dec2, self.decoder.dec3, self.decoder.dec4):
            x = blk(x)
        return x


class TorchVideoOracle(tnn.Module):
    """Same structure + naming as reference models/video_autoencoder.py."""

    def __init__(self, latent=32, hidden=32, layers=2):
        super().__init__()
        enc = tnn.Module()
        enc.encoder = tnn.Sequential(
            tnn.Conv2d(3, 32, 3, padding=1), tnn.BatchNorm2d(32), tnn.LeakyReLU(0.2), tnn.MaxPool2d(2, 2),
            tnn.Conv2d(32, 64, 3, padding=1), tnn.BatchNorm2d(64), tnn.LeakyReLU(0.2), tnn.MaxPool2d(2, 2),
            tnn.Conv2d(64, 128, 3, padding=1), tnn.BatchNorm2d(128), tnn.LeakyReLU(0.2), tnn.MaxPool2d(2, 2),
            tnn.Conv2d(128, latent, 3, padding=1), tnn.BatchNorm2d(latent), tnn.LeakyReLU(0.2), tnn.MaxPool2d(2, 2),
        )
        self.encoder = enc
        lstm = tnn.Module()
        cells = []
        for i in range(layers):
            cell = tnn.Module()
            cin = latent if i == 0 else hidden
            cell.conv = tnn.Conv2d(cin + hidden, 4 * hidden, 3, padding=1)
            cells.append(cell)
        lstm.cells = tnn.ModuleList(cells)
        self.convlstm = lstm
        self.hidden = hidden
        dec = tnn.Module()
        dec.decoder = tnn.Sequential(
            tnn.ConvTranspose2d(hidden, 128, 2, stride=2), tnn.BatchNorm2d(128), tnn.ReLU(),
            tnn.ConvTranspose2d(128, 64, 2, stride=2), tnn.BatchNorm2d(64), tnn.ReLU(),
            tnn.ConvTranspose2d(64, 32, 2, stride=2), tnn.BatchNorm2d(32), tnn.ReLU(),
            tnn.ConvTranspose2d(32, 3, 2, stride=2), tnn.Tanh(),
        )
        self.decoder = dec

    def forward(self, x):  # [B, T, C, H, W]
        b, t, c, h, w = x.shape
        z = self.encoder.encoder(x.reshape(b * t, c, h, w))
        zc, zh, zw = z.shape[1:]
        cur = z.reshape(b, t, zc, zh, zw)
        for cell in self.convlstm.cells:
            hs = torch.zeros(b, self.hidden, zh, zw)
            cs = torch.zeros(b, self.hidden, zh, zw)
            outs = []
            for ti in range(t):
                gates = cell.conv(torch.cat([cur[:, ti], hs], dim=1))
                i, f, g, o = torch.split(gates, self.hidden, dim=1)
                cs = torch.sigmoid(f) * cs + torch.sigmoid(i) * torch.tanh(g)
                hs = torch.sigmoid(o) * torch.tanh(cs)
                outs.append(hs)
            cur = torch.stack(outs, dim=1)
        y = self.decoder.decoder(cur.reshape(b * t, self.hidden, zh, zw))
        return y.reshape(b, t, 3, h, w)


def _randomize_bn_stats(model, rng):
    """Non-trivial running stats so the import path is actually exercised."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data = torch.tensor(
                rng.normal(size=m.running_mean.shape).astype(np.float32) * 0.1
            )
            m.running_var.data = torch.tensor(
                (1.0 + 0.3 * rng.random(m.running_var.shape)).astype(np.float32)
            )


def test_detect_model_type():
    assert detect_model_type({"convlstm.cells.0.conv.weight": 0}) == "video"
    assert detect_model_type({"encoder.enc1.0.weight": 0}) == "image"


def test_image_import_forward_equivalence():
    rng = np.random.default_rng(0)
    oracle = TorchImageOracle(latent=64).eval()
    _randomize_bn_stats(oracle, rng)
    params, stats = import_image_state_dict(oracle.state_dict())

    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = oracle(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))

    model = ConvAutoencoder(latent_dim=64)
    with jax.default_matmul_precision("highest"):
        out = model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
        )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=2e-4)


def test_video_import_forward_equivalence():
    rng = np.random.default_rng(1)
    oracle = TorchVideoOracle(latent=32, hidden=32).eval()
    _randomize_bn_stats(oracle, rng)
    params, stats = import_video_state_dict(oracle.state_dict())

    x = rng.normal(size=(1, 3, 32, 32, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = oracle(torch.tensor(np.transpose(x, (0, 1, 4, 2, 3)))).numpy()
    ref = np.transpose(ref, (0, 1, 3, 4, 2))

    model = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32, lstm_layers=2)
    with jax.default_matmul_precision("highest"):
        out = model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
        )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=2e-4)


def test_export_roundtrip(tmp_path):
    """torch -> ours -> torch: state_dicts numerically identical."""
    from vad_tpu.utils.torch_import import export_image_state_dict

    oracle = TorchImageOracle(latent=64).eval()
    _randomize_bn_stats(oracle, np.random.default_rng(5))
    sd = oracle.state_dict()
    params, stats = import_image_state_dict(sd)
    exported = export_image_state_dict(params, stats)
    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(
            exported[key], val.numpy(), rtol=1e-6, atol=1e-7, err_msg=key
        )


def test_export_cli(tmp_path):
    """our .ckpt -> .pth via the CLI, loadable back by the importer."""
    import jax

    from vad_tpu.utils.checkpoint import save_checkpoint
    from vad_tpu.utils.torch_import import main

    model = ConvAutoencoder(latent_dim=64)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    ours = tmp_path / "m.ckpt"
    save_checkpoint(
        ours,
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
            "epoch": 3,
            "args": {"latent_dim": 64},
            "model_type": "image",
        },
    )
    pth = tmp_path / "m.pth"
    main(["--checkpoint", str(ours), "--out", str(pth), "--export"])
    payload = import_torch_checkpoint(pth)
    assert payload["model_type"] == "image"
    assert payload["epoch"] == 3
    # weights survive the double conversion
    orig = np.asarray(variables["params"]["encoder"]["EncoderBlock_0"]["Conv_0"]["kernel"])
    back = np.asarray(payload["params"]["encoder"]["EncoderBlock_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(back, orig, rtol=1e-6)


def test_video_export_roundtrip():
    """torch -> ours -> torch (video): state_dicts numerically identical."""
    from vad_tpu.utils.torch_import import export_video_state_dict

    oracle = TorchVideoOracle(latent=32, hidden=32).eval()
    _randomize_bn_stats(oracle, np.random.default_rng(6))
    sd = oracle.state_dict()
    params, stats = import_video_state_dict(sd)
    exported = export_video_state_dict(params, stats)
    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(
            exported[key], val.numpy(), rtol=1e-6, atol=1e-7, err_msg=key
        )


def test_video_export_loads_into_reference_model(tmp_path):
    """Exported video .pth loads strict=True into the ACTUAL reference
    VideoAutoencoder (/root/reference/models/video_autoencoder.py:279) and
    produces the same forward outputs as our model."""
    import importlib
    import sys

    ref_root = "/root/reference"
    import os

    if not os.path.isdir(ref_root):  # pragma: no cover - reference absent
        pytest.skip("reference checkout not available")

    from vad_tpu.utils.checkpoint import save_checkpoint
    from vad_tpu.utils.torch_import import export_torch_checkpoint

    rng = np.random.default_rng(7)
    model = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32, lstm_layers=2)
    variables = model.init(jax.random.key(2), jnp.zeros((1, 2, 32, 32, 3)), train=False)
    # non-trivial BN stats so eval-mode parity is actually exercised
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape).astype(np.float32) * 0.1)
        if a.ndim >= 1
        else a,
        variables,
    )
    variables["batch_stats"] = jax.tree.map(
        lambda a: jnp.abs(a) + 0.5, variables["batch_stats"]
    )

    ours = tmp_path / "video.ckpt"
    save_checkpoint(
        ours,
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
            "epoch": 2,
            "args": {"latent_dim": 32, "lstm_hidden_dim": 32, "lstm_layers": 2},
            "model_type": "video",
        },
    )
    pth = tmp_path / "video.pth"
    export_torch_checkpoint(ours, pth)

    sys.path.insert(0, ref_root)
    try:
        ref_mod = importlib.import_module("models.video_autoencoder")
        ref_model = ref_mod.VideoAutoencoder(
            in_channels=3, latent_dim=32, lstm_hidden_dim=32, lstm_num_layers=2
        )
    finally:
        sys.path.remove(ref_root)

    payload = torch.load(pth, map_location="cpu", weights_only=False)
    ref_model.load_state_dict(payload["model_state_dict"], strict=True)
    ref_model.eval()

    x = np.random.default_rng(8).normal(size=(1, 3, 32, 32, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_out = ref_model(torch.tensor(np.transpose(x, (0, 1, 4, 2, 3)))).numpy()
    ref_out = np.transpose(ref_out, (0, 1, 3, 4, 2))
    with jax.default_matmul_precision("highest"):
        ours_out = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(x),
            train=False,
        )
    np.testing.assert_allclose(np.asarray(ours_out), ref_out, rtol=1e-3, atol=2e-4)


def test_full_checkpoint_roundtrip(tmp_path):
    """torch dict -> import CLI payload -> evaluate-compatible .ckpt."""
    oracle = TorchImageOracle(latent=64)
    torch_ckpt = {
        "epoch": 7,
        "model_state_dict": oracle.state_dict(),
        "train_loss": 0.01,
        "val_loss": 0.02,
        "args": {"latent_dim": 64, "image_size": 64, "category": "synthetic"},
    }
    pth = tmp_path / "best_model.pth"
    torch.save(torch_ckpt, pth)

    payload = import_torch_checkpoint(pth)
    assert payload["model_type"] == "image"
    assert payload["epoch"] == 7
    assert payload["args"]["latent_dim"] == 64

    from vad_tpu.utils.checkpoint import save_checkpoint
    from vad_tpu.eval.image_eval import load_image_model

    out = tmp_path / "best_model.ckpt"
    save_checkpoint(out, payload)
    model, variables, train_args = load_image_model(out)
    y = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert y.shape == (1, 64, 64, 3)
