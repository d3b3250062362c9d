"""IoU metric as psum-able histograms.

Reference: mmseg/evaluation/metrics/iou_metric.py:19-286 — per-image
``intersect_and_union`` histograms accumulated over the dataset, reduced on
rank 0, then mIoU/mAcc/aAcc tables.  Here the per-batch histogram update is
a jitted bincount; across a data-parallel mesh the four vectors are summed
by XLA (or trivially on host), which is the entire "distributed evaluation"
protocol.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class IoUState(NamedTuple):
    intersect: jax.Array      # [K]
    union: jax.Array          # [K]
    pred_label: jax.Array     # [K]
    label: jax.Array          # [K]


def init_iou(num_classes: int) -> IoUState:
    z = jnp.zeros((num_classes,), jnp.float64 if jax.config.jax_enable_x64
                  else jnp.float32)
    return IoUState(z, z, z, z)


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_index"))
def update_iou(state: IoUState, pred: jax.Array, label: jax.Array,
               num_classes: int, ignore_index: int = 255) -> IoUState:
    """pred/label: [B, H, W] int. Matches intersect_and_union
    (iou_metric.py:165-230)."""
    valid = label != ignore_index
    pred = jnp.where(valid, pred, num_classes)
    label = jnp.where(valid, label, num_classes)

    def hist(x):
        return jnp.bincount(x.reshape(-1), length=num_classes + 1
                            )[:num_classes].astype(state.intersect.dtype)

    inter = jnp.where(pred == label, pred, num_classes)
    area_i = hist(inter)
    area_p = hist(pred)
    area_l = hist(label)
    return IoUState(
        intersect=state.intersect + area_i,
        union=state.union + area_p + area_l - area_i,
        pred_label=state.pred_label + area_p,
        label=state.label + area_l,
    )


def update_iou_np(state: IoUState, pred: np.ndarray, label: np.ndarray,
                  num_classes: int, ignore_index: int = 255) -> IoUState:
    """Host-side (numpy) histogram update for variable-shape eval images —
    same math as ``update_iou`` without a per-shape XLA retrace."""
    pred = np.asarray(pred).reshape(-1)
    label = np.asarray(label).reshape(-1)
    valid = label != ignore_index
    pred = pred[valid]
    label = label[valid]

    def hist(x):
        return np.bincount(x, minlength=num_classes)[:num_classes]

    area_i = hist(pred[pred == label])
    area_p = hist(pred)
    area_l = hist(label)
    dt = np.asarray(state.intersect).dtype
    return IoUState(
        intersect=np.asarray(state.intersect) + area_i.astype(dt),
        union=np.asarray(state.union) + (area_p + area_l - area_i).astype(dt),
        pred_label=np.asarray(state.pred_label) + area_p.astype(dt),
        label=np.asarray(state.label) + area_l.astype(dt),
    )


def compute_iou(state: IoUState) -> dict[str, np.ndarray | float]:
    """mIoU/mAcc/aAcc over classes present in the GT
    (iou_metric.py:102-162: nan classes excluded via nanmean)."""
    inter = np.asarray(state.intersect, np.float64)
    union = np.asarray(state.union, np.float64)
    plabel = np.asarray(state.pred_label, np.float64)
    label = np.asarray(state.label, np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        iou = inter / union
        acc = inter / label
    iou[union == 0] = np.nan
    acc[label == 0] = np.nan
    aacc = inter.sum() / max(label.sum(), 1.0)
    return {
        "IoU": iou,
        "Acc": acc,
        "mIoU": float(np.nanmean(iou) * 100),
        "mAcc": float(np.nanmean(acc) * 100),
        "aAcc": float(aacc * 100),
    }
