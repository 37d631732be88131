"""Export a trained checkpoint as a StableHLO serving artifact.

Beyond-reference deployment CLI (the reference can only deploy by
shipping its whole training codebase with a pickled state_dict,
evaluate.py:205): stages the scoring step out through `jax.export`
into a self-contained artifact — weights baked in, loadable by any
PJRT runtime without Python or this package.  See
vad_tpu/utils/export.py for the calling conventions.

    python export_model.py --checkpoint results/.../best_model.ckpt \
        --output artifacts/scorer.stablehlo --platforms tpu,cpu

Image checkpoints export a batch-polymorphic uint8 scorer by default
(any request size); video checkpoints export the state-carrying
multi-stream step at a fixed (slots, chunk).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export a checkpoint as a StableHLO serving artifact")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Trained checkpoint (image or video; ours or "
                        "torch-imported)")
    p.add_argument("--output", type=str, required=True,
                   help="Artifact path (a .json sidecar with the calling "
                        "convention is written next to it)")
    p.add_argument("--batch", type=int, default=None,
                   help="Pin the image batch size (default: symbolic — one "
                        "artifact serves any batch)")
    p.add_argument("--slots", type=int, default=16,
                   help="Stream slots for video exports")
    p.add_argument("--chunk", type=int, default=16,
                   help="Frames per step per stream for video exports")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="Compute precision baked into the artifact")
    p.add_argument("--platforms", type=str, default=None,
                   help="Comma-separated lowering targets, e.g. 'tpu,cpu' "
                        "(default: the platform this process runs on)")
    return p


def main() -> None:
    args = build_parser().parse_args()
    from vad_tpu.utils.export import export_from_checkpoint

    platforms = (
        [s.strip() for s in args.platforms.split(",") if s.strip()]
        if args.platforms else None
    )
    path = export_from_checkpoint(
        args.checkpoint, args.output, batch=args.batch,
        num_slots=args.slots, chunk=args.chunk, dtype=args.dtype,
        platforms=platforms,
    )
    import json

    sidecar = json.loads((path.parent / (path.name + ".json")).read_text())
    print(f"Exported {args.checkpoint}")
    print(f"  -> {path} ({sidecar['bytes']:,} bytes, "
          f"platforms {sidecar['platforms']})")
    print(f"  in:  {sidecar['in_avals']}")
    print(f"  out: {sidecar['out_avals']}")


if __name__ == "__main__":
    main()
