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
    from sklearn.metrics import average_precision_score as _sk_ap
    from sklearn.metrics import roc_auc_score as _sk_auroc
    from sklearn.metrics import roc_curve as _sk_roc_curve
except ImportError:  # pragma: no cover
    _sk_ap = None
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


def average_precision(labels: np.ndarray, scores: np.ndarray) -> float:
    """Area under the precision-recall curve (AP step summary).

    AUROC is insensitive to class prevalence: on a test split that is 90%
    anomalous (common for MVTec categories) a detector can post a high
    AUROC while its precision at useful recall is poor, and vice versa.
    AP = Σ_n (R_n − R_{n−1})·P_n over descending-score thresholds is the
    standard complement reported by the anomaly-detection literature; the
    reference computes only AUROC (evaluate.py:74, evaluate_video.py:164).

    sklearn when present; the numpy fallback reproduces sklearn's step
    summation exactly (ties grouped into one threshold, no trapezoid
    interpolation — interpolated AP is known-optimistic).
    """
    labels = np.asarray(labels)
    scores = np.asarray(scores, dtype=np.float64)
    if labels.sum() == 0 or labels.sum() == len(labels):
        raise ValueError("average precision needs both classes present")
    if _sk_ap is not None:
        return float(_sk_ap(labels, scores))
    order = np.argsort(-scores, kind="stable")
    sorted_labels = (labels[order] == 1).astype(np.float64)
    sorted_scores = scores[order]
    tps = np.cumsum(sorted_labels)
    fps = np.cumsum(1.0 - sorted_labels)
    # one (P, R) point per distinct threshold: the last index of each
    # tied-score run (counting part of a tie group would order positives
    # before negatives at the same score — optimistic)
    run_ends = np.nonzero(np.diff(sorted_scores))[0]
    idx = np.concatenate([run_ends, [len(sorted_scores) - 1]])
    precision = tps[idx] / (tps[idx] + fps[idx])
    recall = tps[idx] / tps[-1]
    d_recall = np.diff(np.concatenate([[0.0], recall]))
    return float(np.sum(d_recall * precision))


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


def _label_components(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """4-connected component labeling; scipy when present, else BFS."""
    try:
        from scipy.ndimage import label as _sp_label

        lab, k = _sp_label(mask)
        return lab, int(k)
    except ImportError:  # pragma: no cover - scipy is in the image
        h, w = mask.shape
        lab = np.zeros((h, w), np.int32)
        k = 0
        for i in range(h):
            for j in range(w):
                if mask[i, j] and not lab[i, j]:
                    k += 1
                    stack = [(i, j)]
                    lab[i, j] = k
                    while stack:
                        a, b = stack.pop()
                        for x, y in ((a + 1, b), (a - 1, b), (a, b + 1), (a, b - 1)):
                            if 0 <= x < h and 0 <= y < w and mask[x, y] and not lab[x, y]:
                                lab[x, y] = k
                                stack.append((x, y))
        return lab, k


def aupro(
    masks: np.ndarray,
    error_maps: np.ndarray,
    fpr_limit: float = 0.3,
    num_thresholds: int = 256,
) -> float:
    """Area under the Per-Region-Overlap curve up to ``fpr_limit``, /fpr_limit.

    The standard MVTec-AD localization metric (Bergmann et al., IJCV'21)
    the reference never computes: unlike pixel AUROC — which large defects
    dominate — PRO averages, per threshold, the overlap |component ∩
    prediction| / |component| over every connected GT defect region, so a
    missed small scratch costs as much as a missed large one.  The curve
    is traced against the false-positive rate on normal pixels and
    integrated to ``fpr_limit`` (0.3 is the literature's convention),
    then normalized so 1.0 is perfect.

    Pure host-side numpy: components' and normal pixels' scores are
    sorted once, every threshold is then two binary searches.  Thresholds
    are normal-score quantiles, sampling FPR uniformly on [0, fpr_limit].
    Returns NaN when there are no defect components or no normal pixels.
    """
    masks = np.asarray(masks) > 0.5
    maps = np.asarray(error_maps, np.float64)
    if masks.shape != maps.shape:
        raise ValueError(f"masks {masks.shape} vs error maps {maps.shape}")

    comp_scores = []
    for m, e in zip(masks, maps):
        if not m.any():
            continue
        lab, k = _label_components(m)
        for c in range(1, k + 1):
            comp_scores.append(np.sort(e[lab == c]))
    normal_scores = np.sort(maps[~masks])
    if not comp_scores or normal_scores.size == 0:
        return float("nan")

    n_norm = normal_scores.size
    qs = np.linspace(1.0, 1.0 - fpr_limit, num_thresholds)
    thresholds = np.quantile(normal_scores, qs)
    fprs = 1.0 - np.searchsorted(normal_scores, thresholds, side="left") / n_norm
    pros = np.zeros(len(thresholds))
    for cs in comp_scores:
        pros += 1.0 - np.searchsorted(cs, thresholds, side="left") / cs.size
    pros /= len(comp_scores)

    order = np.argsort(fprs)
    fprs, pros = fprs[order], pros[order]
    # anchor at FPR=0 with the PRO actually achieved by a threshold above
    # every normal pixel (NOT the first measured point: with tie-heavy or
    # constant error maps the lowest measured FPR is already 1.0, and
    # reusing its PRO would credit a zero-information detector with a
    # perfect curve) and clip the tail at fpr_limit by interpolation
    top = normal_scores[-1]
    pro0 = sum(
        1.0 - np.searchsorted(cs, top, side="right") / cs.size
        for cs in comp_scores
    ) / len(comp_scores)
    fprs = np.concatenate([[0.0], fprs])
    pros = np.concatenate([[pro0], pros])
    keep = fprs <= fpr_limit
    f_kept, p_kept = fprs[keep], pros[keep]
    if f_kept[-1] < fpr_limit and keep.sum() < len(fprs):
        p_edge = np.interp(fpr_limit, fprs, pros)
        f_kept = np.concatenate([f_kept, [fpr_limit]])
        p_kept = np.concatenate([p_kept, [p_edge]])
    return float(np.trapezoid(p_kept, f_kept) / fpr_limit)


def calibrate_threshold(
    normal_scores: Sequence[float], quantile: float = 0.99
) -> float | None:
    """Anomaly-decision threshold from validation NORMAL scores only.

    The reference hardcodes 0.004 for images (main.py:283) and mean+2std
    of the analyzed video itself (main.py:357) — the first is meaningless
    off its original training run, the second shifts with the anomaly
    content it is supposed to detect.  Calibrating on held-out normal
    scores targets a fixed false-positive rate (1 - quantile) on normal
    data regardless of model, category, or loss scale.  Returns None when
    no normal scores exist (threshold stays uncalibrated).
    """
    s = np.asarray(list(normal_scores), np.float64)
    if s.size == 0:
        return None
    return float(np.quantile(s, quantile))


def serving_frame_threshold(ckpt: dict) -> float | None:
    """The calibrated threshold valid for PER-FRAME reconstruction scores
    (serving daemon, batch video scoring): ``frame_score_threshold`` (p99
    of held-out normal FRAME scores), and only when the checkpoint's
    training objective was reconstruction — the sequence-level
    ``score_threshold`` applied to frame scores would flag far more than
    its ~1% of normal frames (frame errors fluctuate around their
    sequence mean), and a predict-calibrated threshold is on a different
    score scale than the reconstruction error ``stream_step`` emits."""
    obj = (ckpt.get("args") or {}).get("objective", "reconstruct") or "reconstruct"
    if obj != "reconstruct":
        return None
    return ckpt.get("frame_score_threshold")


def serving_score_baseline(ckpt: dict) -> dict | None:
    """The checkpoint's training-time score distribution, gated exactly
    like `serving_frame_threshold`: a predict-objective checkpoint's
    baseline is on the predict-loss scale while serving emits
    reconstruction error, so anchoring the drift monitor's median-shift
    to it would report large bogus shifts on healthy traffic."""
    obj = (ckpt.get("args") or {}).get("objective", "reconstruct") or "reconstruct"
    if ckpt.get("model_type") != "image" and obj != "reconstruct":
        return None
    return ckpt.get("score_baseline")


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
