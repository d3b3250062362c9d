"""Prediction visualization — SegLocalVisualizer equivalent
(mmseg/visualization/local_visualizer.py:16-230): palette overlay of a
semantic map on the input image, plus Cityscapes-format label-ID PNG export
(the CityscapesMetric writer, metrics/citys_metric.py:26-160)."""
from __future__ import annotations

import os

import numpy as np


def default_palette(num_classes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, (num_classes, 3)).astype(np.uint8)


def draw_sem_seg(image: np.ndarray, sem_seg: np.ndarray,
                 palette: np.ndarray | None = None,
                 alpha: float = 0.5,
                 ignore_index: int = 255) -> np.ndarray:
    """Overlay a class map on an RGB image. image [H,W,3] u8,
    sem_seg [H,W] int."""
    num_classes = int(sem_seg[sem_seg != ignore_index].max()) + 1 \
        if (sem_seg != ignore_index).any() else 1
    if palette is None:
        palette = default_palette(max(num_classes, 1))
    color = np.zeros_like(image)
    valid = sem_seg != ignore_index
    color[valid] = palette[np.clip(sem_seg[valid], 0, len(palette) - 1)]
    out = image.astype(np.float32) * (1 - alpha) + color.astype(
        np.float32) * alpha
    out[~valid] = image[~valid]
    return out.astype(np.uint8)


# trainId -> labelId for the 19 Cityscapes eval classes
CITYSCAPES_TRAIN2LABEL = np.asarray(
    [7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 31, 32,
     33], np.uint8)


def write_cityscapes_pred(pred_train_ids: np.ndarray, out_path: str) -> str:
    """Convert trainIds to official labelIds and write the submission PNG
    (what CityscapesMetric does before invoking cityscapesscripts)."""
    from PIL import Image

    label_ids = np.full(pred_train_ids.shape, 0, np.uint8)
    valid = (pred_train_ids >= 0) & (pred_train_ids < 19)
    label_ids[valid] = CITYSCAPES_TRAIN2LABEL[pred_train_ids[valid]]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    Image.fromarray(label_ids).save(out_path)
    return out_path
