"""Panoptic Quality (PQ) metric.

Reference protocol: panopticapi's PQStat as used by mmdet's
CocoPanopticMetric — per-class TP/FP/FN with segments matched at
IoU > 0.5; the union subtracts the prediction's overlap with VOID; crowd
GT segments are excluded from matching, and unmatched predictions whose
area is mostly VOID or same-class-crowd are not counted as FP.

PQ = Σ_TP IoU / (TP + FP/2 + FN/2);  SQ = Σ IoU / TP;  RQ = TP / (...).

Host-side numpy (eval-time, per image) like the reference — the heavy part
(the network) stays on device.
"""
from __future__ import annotations


import numpy as np

VOID_LABEL = -1  # label value marking void pixels in (label, inst) maps


class PQStat:
    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.iou = np.zeros(num_classes)
        self.tp = np.zeros(num_classes, np.int64)
        self.fp = np.zeros(num_classes, np.int64)
        self.fn = np.zeros(num_classes, np.int64)


def _combine(label_map: np.ndarray, inst_map: np.ndarray) -> np.ndarray:
    """(label, instance) -> single int64 segment key; void -> -1."""
    comb = label_map.astype(np.int64) * (1 << 24) + \
        (inst_map.astype(np.int64) & ((1 << 24) - 1))
    return np.where(label_map == VOID_LABEL, -1, comb)


def pq_update(stat: PQStat,
              pred_label: np.ndarray, pred_inst: np.ndarray,
              gt_label: np.ndarray, gt_inst: np.ndarray,
              gt_crowd: np.ndarray | None = None) -> PQStat:
    """Accumulate one image.  All maps [H, W] int; ``label == -1`` marks
    void.  ``gt_crowd``: boolean map of crowd GT pixels."""
    if gt_crowd is None:
        gt_crowd = np.zeros(gt_label.shape, bool)

    pred_comb = _combine(pred_label, pred_inst)
    gt_comb = _combine(gt_label, gt_inst)

    pred_areas = {int(k): int(c) for k, c in
                  zip(*np.unique(pred_comb, return_counts=True))}
    gt_areas = {int(k): int(c) for k, c in
                zip(*np.unique(gt_comb, return_counts=True))}
    crowd_keys = set(
        int(k) for k in np.unique(gt_comb[gt_crowd])) - {-1}

    # pairwise intersections (IoU > 0.5 makes matches unique per segment,
    # so greedy order is immaterial; sort by area for determinism)
    pairs, counts = np.unique(
        np.stack([pred_comb.ravel(), gt_comb.ravel()]), axis=1,
        return_counts=True)
    inter: dict[tuple[int, int], int] = {
        (int(p), int(g)): int(c) for (p, g), c in zip(pairs.T, counts)}

    def label_of(key: int) -> int:
        return key >> 24

    # prediction overlap with VOID (for the union correction + FP rule)
    pred_void = {p: c for (p, g), c in inter.items() if g == -1}

    matched_pred: set[int] = set()
    matched_gt: set[int] = set()
    for (pk, gk), i_area in sorted(inter.items(),
                                   key=lambda kv: -kv[1]):
        if pk == -1 or gk == -1 or gk in crowd_keys:
            continue
        pl, gl = label_of(pk), label_of(gk)
        if pl != gl or pk in matched_pred or gk in matched_gt:
            continue
        union = (pred_areas[pk] + gt_areas[gk] - i_area
                 - pred_void.get(pk, 0))
        iou = i_area / max(union, 1)
        if iou > 0.5:
            stat.tp[gl] += 1
            stat.iou[gl] += iou
            matched_pred.add(pk)
            matched_gt.add(gk)

    # FN: unmatched non-void, non-crowd GT segments
    for gk in gt_areas:
        if gk == -1 or gk in crowd_keys or gk in matched_gt:
            continue
        stat.fn[label_of(gk)] += 1

    # FP: unmatched predictions unless mostly VOID/same-class-crowd covered
    for pk, area in pred_areas.items():
        if pk == -1 or pk in matched_pred:
            continue
        pl = label_of(pk)
        ignore = pred_void.get(pk, 0)
        for ck in crowd_keys:
            if label_of(ck) == pl:
                ignore += inter.get((pk, ck), 0)
        if ignore / max(area, 1) > 0.5:
            continue
        stat.fp[pl] += 1
    return stat


def compute_pq(stat: PQStat, num_things: int | None = None) -> dict:
    denom = stat.tp + stat.fp / 2 + stat.fn / 2
    present = denom > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        pq = np.where(present, stat.iou / np.maximum(denom, 1e-9), np.nan)
        sq = np.where(stat.tp > 0, stat.iou / np.maximum(stat.tp, 1), np.nan)
        rq = np.where(present, stat.tp / np.maximum(denom, 1e-9), np.nan)
    out = {
        "PQ": float(np.nanmean(pq) * 100) if present.any() else 0.0,
        "SQ": float(np.nanmean(sq) * 100) if (stat.tp > 0).any() else 0.0,
        "RQ": float(np.nanmean(rq) * 100) if present.any() else 0.0,
        "per_class_PQ": pq * 100,
    }
    if num_things is not None:
        th, st = pq[:num_things], pq[num_things:]
        out["PQ_th"] = (float(np.nanmean(th) * 100)
                        if np.isfinite(th).any() else float("nan"))
        out["PQ_st"] = (float(np.nanmean(st) * 100)
                        if np.isfinite(st).any() else float("nan"))
    return out
