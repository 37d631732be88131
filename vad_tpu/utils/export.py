"""Ahead-of-time scoring-step export: StableHLO serving artifacts.

`jax.export` stages the jitted scoring step out to StableHLO and
serializes it with the trained weights baked in as constants — a
self-contained, versioned artifact that any PJRT-backed runtime (C++
serving binaries, tf.saved_model via jax2tf, a future Python-less TPU
host) can load and execute without this package, Flax, or even Python.
This is the XLA-native deployment story the reference cannot offer: its
checkpoints are pickled torch state_dicts that only the training
codebase itself can reanimate (train.py:188's torch.save consumed by
evaluate.py:205's load_state_dict).

Two artifacts cover both serving paths:

- **image scorer**: uint8 ``[B, H, W, 3]`` -> float32 ``[B]`` anomaly
  scores.  ``batch=None`` exports a SYMBOLIC batch dimension (shape
  polymorphism), so one artifact serves any request size — the loader
  does not inherit our padded-batch serving convention unless it wants
  it.
- **video stream step**: ``(frames u8 [S, T, H, W, 3], states, submitted
  bool [S]) -> (scores f32 [S, T], states)`` — the SAME state-threading
  contract as MultiStreamScorer's compiled step (eval/serving.py:194),
  including the submitted-mask rule that only submitting slots advance
  their carried (h, c).  A loader holds the state pytree between calls
  and gets bit-identical scoring to the Python daemon.

Exports default to the portable XLA recurrence backend: a Pallas kernel
is serialized as a TPU-only custom call, which pins the artifact to the
exporting generation; the XLA path lowers everywhere (``platforms``
can name several targets, e.g. ("tpu", "cpu")).

Precision note: bf16 export bakes the serving cast policy into the
artifact exactly like the daemon (utils/precision.py) — scores match
`serve.py --dtype bfloat16` serving, not f32 evaluation.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

ARTIFACT_SUFFIX = ".stablehlo"


def _score_fn_image(model, variables, dtype):
    import jax.numpy as jnp

    from vad_tpu.models.autoencoder import ConvAutoencoder

    def score(u8):
        x = u8.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
        return model.apply(
            variables, x, method=ConvAutoencoder.reconstruction_error
        ).astype(jnp.float32)

    return score


def export_image_scorer(
    model,
    variables,
    image_size,
    batch: Optional[int] = None,
    dtype=None,
    platforms: Optional[Sequence[str]] = None,
):
    """Export the stateless image scoring step.  ``batch=None`` -> a
    symbolic batch dimension (any request size); an int pins it.
    Returns a `jax.export.Exported` (call it via ``.call``, persist via
    `save_artifact`)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from vad_tpu.utils.precision import cast_floating

    dtype = dtype or jnp.bfloat16
    if dtype != jnp.float32:
        variables = cast_floating(variables, dtype)
    hw = tuple(image_size) if isinstance(image_size, (tuple, list)) else (
        image_size, image_size)
    b = jexport.symbolic_shape("b")[0] if batch is None else batch
    spec = jax.ShapeDtypeStruct((b, *hw, 3), jnp.uint8)
    fn = jax.jit(_score_fn_image(model, variables, dtype))
    return jexport.export(fn, platforms=_platform_list(platforms))(spec)


def export_video_stream_step(
    model,
    variables,
    num_slots: int = 16,
    chunk: int = 16,
    image_size=256,
    dtype=None,
    platforms: Optional[Sequence[str]] = None,
):
    """Export the state-carrying multi-stream video scoring step.

    Calling convention (positional):
        scores, (h0, c0), (h1, c1), ... = call(frames_u8, states, submitted)
    where ``states`` is the ConvLSTM carry pytree — start from zeros of
    shape [S, H/16, W/16, hidden] f32 per (h, c) — and ``submitted`` is
    the bool [S] mask of slots whose rows are real frames this tick
    (identical semantics to eval/serving.py:194-206)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from vad_tpu.models.video_autoencoder import ConvLSTM, VideoAutoencoder
    from vad_tpu.utils.precision import cast_floating

    dtype = dtype or jnp.bfloat16
    if dtype != jnp.float32:
        variables = cast_floating(variables, dtype)
    hw = tuple(image_size) if isinstance(image_size, (tuple, list)) else (
        image_size, image_size)
    if hw[0] % 16 or hw[1] % 16:
        raise ValueError(f"image size {hw} must be divisible by 16")

    def step(u8, states, submitted):
        x = u8.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
        _, _, scores, new_states = model.apply(
            variables, x, states, method=VideoAutoencoder.stream_step
        )
        keep = submitted.reshape(-1, 1, 1, 1)
        out_states = tuple(
            (jnp.where(keep, h_new, h_old), jnp.where(keep, c_new, c_old))
            for (h_new, c_new), (h_old, c_old) in zip(new_states, states)
        )
        return scores.astype(jnp.float32), out_states

    zero = ConvLSTM.zero_state(
        model.lstm_layers, num_slots, hw[0] // 16, hw[1] // 16,
        model.lstm_hidden_dim, dtype=jnp.float32,
    )
    specs = (
        jax.ShapeDtypeStruct((num_slots, chunk, *hw, 3), jnp.uint8),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), zero),
        jax.ShapeDtypeStruct((num_slots,), jnp.bool_),
    )
    fn = jax.jit(step)
    return jexport.export(fn, platforms=_platform_list(platforms))(*specs)


def _platform_list(platforms):
    if platforms is None:
        return None
    out = [str(p).lower() for p in platforms]
    return out or None


def save_artifact(exported, path, meta: Optional[dict] = None) -> Path:
    """Serialize an Exported to ``path`` (+ a human-readable JSON sidecar
    ``path + '.json'`` recording the calling convention)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = exported.serialize()
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(path)  # atomic like checkpoints (utils/checkpoint.py)
    sidecar = {
        "fn_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "calling_convention_version": exported.calling_convention_version,
        # from the avals, NOT Exported.uses_global_constants — that flag
        # is also True for fixed-shape multi-platform exports (the
        # platform index is a global constant), which would mislabel them
        "uses_shape_polymorphism": any(
            not isinstance(d, int)
            for a in exported.in_avals for d in a.shape
        ),
        "bytes": len(data),
        **(meta or {}),
    }
    path.with_name(path.name + ".json").write_text(
        json.dumps(sidecar, indent=2) + "\n"
    )
    return path


def load_artifact(path):
    """Deserialize a saved artifact back to a callable Exported."""
    from jax import export as jexport

    return jexport.deserialize(Path(path).read_bytes())


def export_from_checkpoint(
    checkpoint,
    output,
    *,
    batch: Optional[int] = None,
    num_slots: int = 16,
    chunk: int = 16,
    dtype: str = "bfloat16",
    platforms: Optional[Sequence[str]] = None,
) -> Path:
    """Build the right artifact for a checkpoint (image or video) and
    write it to ``output``.  The model architecture is reconstructed
    from the checkpoint's own args (self-describing checkpoints,
    utils/checkpoint.py), exactly like serve_from_checkpoint."""
    import jax.numpy as jnp

    from vad_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(checkpoint)
    variables = {"params": ckpt["params"],
                 "batch_stats": ckpt.get("batch_stats") or {}}
    jdtype = getattr(jnp, dtype)
    if ckpt.get("model_type") == "image":
        from vad_tpu.core.config import ImageAEConfig
        from vad_tpu.models.autoencoder import ConvAutoencoder

        cfg = ImageAEConfig.from_args(ckpt.get("args", {}))
        model = ConvAutoencoder(in_channels=cfg.in_channels,
                                latent_dim=cfg.latent_dim, norm=cfg.norm,
                                stem=cfg.stem)
        exported = export_image_scorer(
            model, variables, cfg.image_size, batch=batch, dtype=jdtype,
            platforms=platforms,
        )
        meta = {"kind": "image", "image_size": cfg.image_size,
                "batch": batch, "dtype": dtype}
    else:
        from vad_tpu.core.config import VideoAEConfig
        from vad_tpu.models.video_autoencoder import VideoAutoencoder

        cfg = VideoAEConfig.from_args(ckpt.get("args", {}))
        # portable XLA recurrence: a Pallas custom call would pin the
        # artifact to the exporting TPU generation (module docstring)
        model = VideoAutoencoder(
            in_channels=cfg.in_channels, latent_dim=cfg.latent_dim,
            lstm_hidden_dim=cfg.lstm_hidden_dim, lstm_layers=cfg.lstm_layers,
            backend="xla", norm=cfg.norm, stem=cfg.stem,
        )
        exported = export_video_stream_step(
            model, variables, num_slots=num_slots, chunk=chunk,
            image_size=cfg.image_size, dtype=jdtype, platforms=platforms,
        )
        meta = {"kind": "video", "image_size": cfg.image_size,
                "num_slots": num_slots, "chunk": chunk, "dtype": dtype,
                "state_contract": "only submitted slots advance (h, c)"}
    meta["checkpoint"] = str(checkpoint)
    thr = (ckpt.get("score_threshold") if meta["kind"] == "image"
           else ckpt.get("frame_score_threshold"))
    if thr is not None:
        meta["score_threshold"] = float(thr)
    return save_artifact(exported, output, meta)
