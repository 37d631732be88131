from vad_tpu.eval.metrics import auroc, per_defect_breakdown, separation_ratio  # noqa: F401
