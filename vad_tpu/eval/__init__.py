from vad_tpu.eval.drift import ScoreWindow, score_baseline  # noqa: F401
from vad_tpu.eval.latent_score import (  # noqa: F401
    LatentStats,
    fit_latent_stats,
    load_stats,
    make_distance_fn,
    make_distance_step,
    save_stats,
    stats_state,
    upsample_maps,
)
from vad_tpu.eval.metrics import (  # noqa: F401
    aupro,
    auroc,
    average_precision,
    calibrate_threshold,
    per_defect_breakdown,
    separation_ratio,
)
