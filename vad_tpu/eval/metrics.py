"""Host-side metrics: AUROC, ROC points, separation, per-defect stats.

Scores are computed on device and transferred once per eval; the metric
arithmetic is tiny and stays on host (reference uses sklearn —
evaluate.py:74; we use sklearn when present with a numpy rank-statistic
fallback so the framework has no hard sklearn dependency).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

try:
    from sklearn.metrics import roc_auc_score as _sk_auroc
    from sklearn.metrics import roc_curve as _sk_roc_curve
except ImportError:  # pragma: no cover
    _sk_auroc = None
    _sk_roc_curve = None


def auroc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Area under ROC.  1.0 perfect, 0.5 chance."""
    labels = np.asarray(labels)
    scores = np.asarray(scores, dtype=np.float64)
    if _sk_auroc is not None:
        return float(_sk_auroc(labels, scores))
    # Mann-Whitney U formulation with midranks for ties.
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    if len(pos) == 0 or len(neg) == 0:
        raise ValueError("AUROC needs both classes present")
    allv = np.concatenate([pos, neg])
    order = np.argsort(allv)
    sorted_v = allv[order]
    rank_vals = np.empty_like(sorted_v)
    i = 0
    while i < len(sorted_v):
        j = i
        while j + 1 < len(sorted_v) and sorted_v[j + 1] == sorted_v[i]:
            j += 1
        rank_vals[i : j + 1] = 0.5 * (i + j) + 1.0
        i = j + 1
    ranks = np.empty_like(rank_vals)
    ranks[order] = rank_vals
    r_pos = ranks[: len(pos)].sum()
    u = r_pos - len(pos) * (len(pos) + 1) / 2.0
    return float(u / (len(pos) * len(neg)))


def roc_points(labels: np.ndarray, scores: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(fpr, tpr) arrays for plotting."""
    labels = np.asarray(labels)
    scores = np.asarray(scores, dtype=np.float64)
    if _sk_roc_curve is not None:
        fpr, tpr, _ = _sk_roc_curve(labels, scores)
        return fpr, tpr
    order = np.argsort(-scores)
    labels = labels[order]
    sorted_scores = scores[order]
    tps = np.cumsum(labels == 1)
    fps = np.cumsum(labels == 0)
    # one point per distinct threshold (the last index of each tied-score
    # run), mirroring sklearn.roc_curve — emitting every sample would draw
    # an optimistic diagonal through ties (positives counted before
    # negatives at the same score).
    run_ends = np.nonzero(np.diff(sorted_scores))[0]
    idx = np.concatenate([run_ends, [len(sorted_scores) - 1]])
    tpr = np.concatenate([[0.0], tps[idx] / max(tps[-1], 1)])
    fpr = np.concatenate([[0.0], fps[idx] / max(fps[-1], 1)])
    return fpr, tpr


def separation_ratio(normal_scores: Sequence[float], anomaly_scores: Sequence[float]) -> float:
    """mean(anomaly) / mean(normal) — the reference's model-selection and
    monitoring metric (train.py:195, train_video.py:209)."""
    normal_scores = np.asarray(list(normal_scores))
    anomaly_scores = np.asarray(list(anomaly_scores))
    if len(normal_scores) == 0 or normal_scores.mean() <= 0:
        return 0.0
    if len(anomaly_scores) == 0:
        return 0.0
    return float(anomaly_scores.mean() / normal_scores.mean())


def per_defect_breakdown(
    labels: np.ndarray, scores: np.ndarray, defect_types: List[str]
) -> Dict[str, Dict]:
    """{defect: {count, mean_score, is_anomaly}} like reference
    evaluate.py:77-89."""
    labels = np.asarray(labels)
    scores = np.asarray(scores)
    out: Dict[str, Dict] = {}
    for defect in sorted(set(defect_types)):
        mask = np.array([d == defect for d in defect_types])
        out[defect] = {
            "count": int(mask.sum()),
            "mean_score": float(scores[mask].mean()),
            "is_anomaly": int(labels[mask][0]) if mask.any() else 0,
        }
    return out
