"""Test-time augmentation — SegTTAModel equivalent
(mmseg/models/segmentors/seg_tta.py:13): average logits over horizontal
flip and multiple scales, then argmax."""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear


def tta_logits(predict_fn: Callable[[jax.Array], jax.Array],
               images: jax.Array,
               scales: Sequence[float] = (1.0,),
               flip: bool = True) -> jax.Array:
    """predict_fn: [B, H, W, 3] -> [B, H, W, K] logits at input size.
    Averages logits across flipped/rescaled variants resized back to the
    original resolution."""
    b, h, w, _ = images.shape
    acc = None
    n = 0
    for s in scales:
        sh, sw = int(round(h * s)), int(round(w * s))
        x = images if (sh, sw) == (h, w) else resize_bilinear(
            images, (sh, sw))
        variants = [x] + ([x[:, :, ::-1]] if flip else [])
        for i, v in enumerate(variants):
            logits = predict_fn(v)
            if i == 1:
                logits = logits[:, :, ::-1]
            if logits.shape[1:3] != (h, w):
                logits = resize_bilinear(logits, (h, w))
            acc = logits if acc is None else acc + logits
            n += 1
    return acc / n


def panoptic_inference(cls_scores: jax.Array, mask_preds: jax.Array,
                       object_mask_thr: float = 0.8,
                       iou_thr: float = 0.8,
                       num_things: int = 80) -> tuple[jax.Array, jax.Array]:
    """Mask-classification panoptic merge (the mmdet-side head's panoptic
    postprocessing, maskformer_fusion_head-style): per-pixel argmax over
    score-weighted masks of confident queries.

    cls_scores: [B, nq, K+1]; mask_preds: [B, nq, H, W] logits.
    Returns (sem_map [B, H, W], instance_id_map [B, H, W]) where
    instance ids number the winning queries (0 = void/stuff-merged).
    """
    probs = jax.nn.softmax(cls_scores, axis=-1)
    scores = jnp.max(probs[..., :-1], axis=-1)      # [B, nq]
    labels = jnp.argmax(probs[..., :-1], axis=-1)   # [B, nq]
    keep = (scores > object_mask_thr)

    mask_prob = jax.nn.sigmoid(mask_preds)          # [B, nq, H, W]
    weighted = mask_prob * (scores * keep)[..., None, None]
    winner = jnp.argmax(weighted, axis=1)           # [B, H, W] query index
    win_score = jnp.take_along_axis(
        weighted, winner[:, None], axis=1)[:, 0]
    valid = win_score > 0.5
    sem = jnp.take_along_axis(
        labels, winner.reshape(labels.shape[0], -1), axis=1
    ).reshape(winner.shape)
    sem = jnp.where(valid, sem, -1)
    inst = jnp.where(valid & (sem < num_things), winner + 1, 0)
    return sem.astype(jnp.int32), inst.astype(jnp.int32)
