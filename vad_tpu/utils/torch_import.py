"""Import reference (PyTorch) checkpoints into this framework.

A user of the reference can bring their trained `best_model.pth` directly:

    python -m vad_tpu.utils.torch_import --checkpoint best_model.pth \
        --out best_model.ckpt

The importer maps the reference's exact module naming
(models/autoencoder.py: encoder.enc1..enc4 / decoder.dec1..dec4;
models/video_autoencoder.py: encoder.encoder.N / convlstm.cells.K.conv /
proj / decoder.decoder.N) onto this framework's Flax trees, with the
layout conversions:

- Conv2d weight  [O, I, kh, kw] -> [kh, kw, I, O];
- ConvTranspose2d weight [I, O, kh, kw] -> [kh, kw, I, O] with both
  spatial dims flipped (flax ConvTranspose is a fractionally-strided
  convolution, torch's is the conv gradient; verified numerically in
  tests/test_torch_import.py);
- BatchNorm weight/bias -> scale/bias params, running_mean/var ->
  batch_stats;
- the fused ConvLSTM gate conv [4H, I+H, k, k] -> kernel [k, k, I+H, 4H]
  (identical i, f, g, o gate order).

The resulting checkpoint is self-describing (same ``args``) and behaves
identically through evaluate.py / evaluate_video.py within float
tolerance.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv_kernel(w) -> np.ndarray:
    return np.transpose(_np(w), (2, 3, 1, 0))


def _convT_kernel(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(_np(w), (2, 3, 0, 1))[::-1, ::-1])


def _bn(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _conv(sd: Mapping, prefix: str) -> Dict:
    out = {"kernel": _conv_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _convT(sd: Mapping, prefix: str) -> Dict:
    out = {"kernel": _convT_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def import_image_state_dict(sd: Mapping) -> Tuple[Dict, Dict]:
    """Reference ConvAutoencoder state_dict -> (params, batch_stats)."""
    params: Dict[str, Any] = {"encoder": {}, "decoder": {}}
    stats: Dict[str, Any] = {"encoder": {}, "decoder": {}}

    # encoder: enc1..enc4, each Sequential [Conv,BN,LReLU,Conv,BN,LReLU,Pool]
    for i in range(4):
        blk_p: Dict[str, Any] = {}
        blk_s: Dict[str, Any] = {}
        for j, (ci, bi) in enumerate(((0, 1), (3, 4))):
            blk_p[f"Conv_{j}"] = _conv(sd, f"encoder.enc{i + 1}.{ci}")
            bn_p, bn_s = _bn(sd, f"encoder.enc{i + 1}.{bi}")
            blk_p[f"BatchNorm_{j}"] = bn_p
            blk_s[f"BatchNorm_{j}"] = bn_s
        params["encoder"][f"EncoderBlock_{i}"] = blk_p
        stats["encoder"][f"EncoderBlock_{i}"] = blk_s

    # decoder blocks dec1..dec3: Sequential [ConvT,BN,ReLU,Conv,BN,ReLU]
    for i in range(3):
        blk_p = {"ConvTranspose_0": _convT(sd, f"decoder.dec{i + 1}.0")}
        blk_s = {}
        bn_p, bn_s = _bn(sd, f"decoder.dec{i + 1}.1")
        blk_p["BatchNorm_0"] = bn_p
        blk_s["BatchNorm_0"] = bn_s
        blk_p["Conv_0"] = _conv(sd, f"decoder.dec{i + 1}.3")
        bn_p, bn_s = _bn(sd, f"decoder.dec{i + 1}.4")
        blk_p["BatchNorm_1"] = bn_p
        blk_s["BatchNorm_1"] = bn_s
        params["decoder"][f"DecoderBlock_{i}"] = blk_p
        stats["decoder"][f"DecoderBlock_{i}"] = blk_s

    # final block dec4: [ConvT,BN,ReLU,Conv,Tanh]
    params["decoder"]["ConvTranspose_0"] = _convT(sd, "decoder.dec4.0")
    bn_p, bn_s = _bn(sd, "decoder.dec4.1")
    params["decoder"]["BatchNorm_0"] = bn_p
    stats["decoder"]["BatchNorm_0"] = bn_s
    params["decoder"]["Conv_0"] = _conv(sd, "decoder.dec4.3")
    return params, stats


def import_video_state_dict(sd: Mapping) -> Tuple[Dict, Dict]:
    """Reference VideoAutoencoder state_dict -> (params, batch_stats)."""
    params: Dict[str, Any] = {"encoder": {}, "convlstm": {}, "decoder": {}}
    stats: Dict[str, Any] = {"encoder": {}}

    # encoder Sequential: [Conv,BN,LReLU,Pool] x4 -> conv 0,4,8,12; bn 1,5,9,13
    for i in range(4):
        params["encoder"][f"Conv_{i}"] = _conv(sd, f"encoder.encoder.{4 * i}")
        bn_p, bn_s = _bn(sd, f"encoder.encoder.{4 * i + 1}")
        params["encoder"][f"BatchNorm_{i}"] = bn_p
        stats["encoder"][f"BatchNorm_{i}"] = bn_s

    # ConvLSTM cells: fused gate conv [4H, I+H, k, k]
    layer = 0
    while f"convlstm.cells.{layer}.conv.weight" in sd:
        params["convlstm"][f"ConvLSTMLayer_{layer}"] = {
            "kernel": _conv_kernel(sd[f"convlstm.cells.{layer}.conv.weight"]),
            "bias": _np(sd[f"convlstm.cells.{layer}.conv.bias"]),
        }
        layer += 1

    if "proj.weight" in sd:  # 1x1 projection (only when hidden != latent)
        params["proj"] = _conv(sd, "proj")

    # decoder Sequential: [ConvT,BN,ReLU] x3 + [ConvT,Tanh]
    stats["decoder"] = {}
    for i in range(3):
        params["decoder"][f"ConvTranspose_{i}"] = _convT(sd, f"decoder.decoder.{3 * i}")
        bn_p, bn_s = _bn(sd, f"decoder.decoder.{3 * i + 1}")
        params["decoder"][f"BatchNorm_{i}"] = bn_p
        stats["decoder"][f"BatchNorm_{i}"] = bn_s
    params["decoder"]["ConvTranspose_3"] = _convT(sd, "decoder.decoder.9")
    return params, stats


def detect_model_type(sd: Mapping) -> str:
    return "video" if any(k.startswith("convlstm.") for k in sd) else "image"


def import_torch_checkpoint(checkpoint: str | Path | Mapping) -> Dict[str, Any]:
    """Full reference checkpoint (path or loaded dict) -> our payload dict."""
    if isinstance(checkpoint, (str, Path)):
        import torch

        checkpoint = torch.load(str(checkpoint), map_location="cpu", weights_only=False)
    sd = checkpoint.get("model_state_dict", checkpoint)
    model_type = detect_model_type(sd)
    if model_type == "video":
        params, batch_stats = import_video_state_dict(sd)
    else:
        params, batch_stats = import_image_state_dict(sd)
    return {
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": None,  # torch Adam moments are not transferable
        "epoch": checkpoint.get("epoch"),
        "train_loss": checkpoint.get("train_loss"),
        "val_loss": checkpoint.get("val_loss"),
        "separation": checkpoint.get("separation"),
        "history": checkpoint.get("history"),
        "args": dict(checkpoint.get("args", {})),
        "model_type": model_type,
        "imported_from": "pytorch",
    }


# ------------------------------------------------------------- export


def _conv_kernel_to_torch(k) -> np.ndarray:
    return np.transpose(np.asarray(k), (3, 2, 0, 1))  # HWIO -> OIHW


def _convT_kernel_to_torch(k) -> np.ndarray:
    # invert _convT_kernel: unflip spatial, HWIO -> IOHW
    return np.ascontiguousarray(
        np.transpose(np.asarray(k)[::-1, ::-1], (2, 3, 0, 1))
    )


def _export_bn(params: Mapping, stats: Mapping, prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = np.asarray(params["scale"])
    out[f"{prefix}.bias"] = np.asarray(params["bias"])
    out[f"{prefix}.running_mean"] = np.asarray(stats["mean"])
    out[f"{prefix}.running_var"] = np.asarray(stats["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def export_image_state_dict(params: Mapping, stats: Mapping) -> dict:
    """(params, batch_stats) -> reference-named torch state_dict arrays."""
    if not stats:
        raise ValueError(
            "checkpoint has no batch_stats — models trained with "
            "--norm group cannot map onto the reference's BatchNorm layers"
        )
    out: dict = {}
    for i in range(4):
        blk_p = params["encoder"][f"EncoderBlock_{i}"]
        blk_s = stats["encoder"][f"EncoderBlock_{i}"]
        for j, (ci, bi) in enumerate(((0, 1), (3, 4))):
            out[f"encoder.enc{i + 1}.{ci}.weight"] = _conv_kernel_to_torch(
                blk_p[f"Conv_{j}"]["kernel"]
            )
            out[f"encoder.enc{i + 1}.{ci}.bias"] = np.asarray(blk_p[f"Conv_{j}"]["bias"])
            _export_bn(blk_p[f"BatchNorm_{j}"], blk_s[f"BatchNorm_{j}"],
                       f"encoder.enc{i + 1}.{bi}", out)
    for i in range(3):
        blk_p = params["decoder"][f"DecoderBlock_{i}"]
        blk_s = stats["decoder"][f"DecoderBlock_{i}"]
        out[f"decoder.dec{i + 1}.0.weight"] = _convT_kernel_to_torch(
            blk_p["ConvTranspose_0"]["kernel"]
        )
        out[f"decoder.dec{i + 1}.0.bias"] = np.asarray(blk_p["ConvTranspose_0"]["bias"])
        _export_bn(blk_p["BatchNorm_0"], blk_s["BatchNorm_0"], f"decoder.dec{i + 1}.1", out)
        out[f"decoder.dec{i + 1}.3.weight"] = _conv_kernel_to_torch(blk_p["Conv_0"]["kernel"])
        out[f"decoder.dec{i + 1}.3.bias"] = np.asarray(blk_p["Conv_0"]["bias"])
        _export_bn(blk_p["BatchNorm_1"], blk_s["BatchNorm_1"], f"decoder.dec{i + 1}.4", out)
    out["decoder.dec4.0.weight"] = _convT_kernel_to_torch(
        params["decoder"]["ConvTranspose_0"]["kernel"]
    )
    out["decoder.dec4.0.bias"] = np.asarray(params["decoder"]["ConvTranspose_0"]["bias"])
    _export_bn(params["decoder"]["BatchNorm_0"], stats["decoder"]["BatchNorm_0"],
               "decoder.dec4.1", out)
    out["decoder.dec4.3.weight"] = _conv_kernel_to_torch(params["decoder"]["Conv_0"]["kernel"])
    out["decoder.dec4.3.bias"] = np.asarray(params["decoder"]["Conv_0"]["bias"])
    return out


def export_video_state_dict(params: Mapping, stats: Mapping) -> dict:
    """(params, batch_stats) -> reference-named torch state_dict arrays.

    Inverse of `import_video_state_dict`: targets the exact module naming
    of reference models/video_autoencoder.py:279-327 (encoder.encoder.N,
    convlstm.cells.K.conv, optional proj, decoder.decoder.N), so the
    result loads with ``strict=True`` into the reference VideoAutoencoder.
    """
    if not stats:
        raise ValueError(
            "checkpoint has no batch_stats — models trained with "
            "--norm group cannot map onto the reference's BatchNorm layers"
        )
    out: dict = {}
    for i in range(4):
        out[f"encoder.encoder.{4 * i}.weight"] = _conv_kernel_to_torch(
            params["encoder"][f"Conv_{i}"]["kernel"]
        )
        out[f"encoder.encoder.{4 * i}.bias"] = np.asarray(
            params["encoder"][f"Conv_{i}"]["bias"]
        )
        _export_bn(
            params["encoder"][f"BatchNorm_{i}"], stats["encoder"][f"BatchNorm_{i}"],
            f"encoder.encoder.{4 * i + 1}", out,
        )

    layer = 0
    while f"ConvLSTMLayer_{layer}" in params["convlstm"]:
        cell = params["convlstm"][f"ConvLSTMLayer_{layer}"]
        out[f"convlstm.cells.{layer}.conv.weight"] = _conv_kernel_to_torch(cell["kernel"])
        out[f"convlstm.cells.{layer}.conv.bias"] = np.asarray(cell["bias"])
        layer += 1

    if "proj" in params:  # 1x1 projection (only when hidden != latent)
        out["proj.weight"] = _conv_kernel_to_torch(params["proj"]["kernel"])
        out["proj.bias"] = np.asarray(params["proj"]["bias"])

    for i in range(3):
        out[f"decoder.decoder.{3 * i}.weight"] = _convT_kernel_to_torch(
            params["decoder"][f"ConvTranspose_{i}"]["kernel"]
        )
        out[f"decoder.decoder.{3 * i}.bias"] = np.asarray(
            params["decoder"][f"ConvTranspose_{i}"]["bias"]
        )
        _export_bn(
            params["decoder"][f"BatchNorm_{i}"], stats["decoder"][f"BatchNorm_{i}"],
            f"decoder.decoder.{3 * i + 1}", out,
        )
    out["decoder.decoder.9.weight"] = _convT_kernel_to_torch(
        params["decoder"]["ConvTranspose_3"]["kernel"]
    )
    out["decoder.decoder.9.bias"] = np.asarray(params["decoder"]["ConvTranspose_3"]["bias"])
    return out


def export_torch_checkpoint(checkpoint_path: str | Path, out_path: str | Path) -> None:
    """Our .ckpt -> a torch .pth loadable by the reference (both families).

    Model family is detected from the param tree ('convlstm' subtree =>
    video), matching the importer's `detect_model_type`.  The payload
    carries the reference checkpoint schema (train.py:208-225 /
    train_video.py:241-285: epoch, model_state_dict, losses, separation,
    args) so reference evaluate.py / evaluate_video.py can rebuild the
    model from ``args`` as usual.
    """
    import torch

    from vad_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(checkpoint_path)
    is_video = "convlstm" in ckpt["params"]
    exporter = export_video_state_dict if is_video else export_image_state_dict
    sd = {
        k: torch.tensor(np.asarray(v))
        for k, v in exporter(ckpt["params"], ckpt["batch_stats"]).items()
    }
    payload = {
        "epoch": ckpt.get("epoch"),
        "model_state_dict": sd,
        "train_loss": ckpt.get("train_loss"),
        "val_loss": ckpt.get("val_loss"),
        "args": ckpt.get("args", {}),
    }
    if is_video:
        for key in ("separation", "normal_err", "anomaly_err", "history"):
            if ckpt.get(key) is not None:
                payload[key] = ckpt[key]
    torch.save(payload, str(out_path))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Convert checkpoints between this framework and the torch reference"
    )
    parser.add_argument("--checkpoint", required=True, help="input checkpoint (.pth or .ckpt)")
    parser.add_argument("--out", required=True, help="output path (.ckpt or .pth)")
    parser.add_argument(
        "--export", action="store_true",
        help="convert our .ckpt to a torch .pth (default: import .pth -> .ckpt)",
    )
    args = parser.parse_args(argv)

    if args.export:
        export_torch_checkpoint(args.checkpoint, args.out)
        print(f"Exported checkpoint -> {args.out}")
        return

    from vad_tpu.utils.checkpoint import save_checkpoint

    payload = import_torch_checkpoint(args.checkpoint)
    save_checkpoint(args.out, payload)
    print(f"Imported {payload['model_type']} checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
