"""Per-pixel segmentation losses for the FPN heads.

Reference: mmseg/models/decode_heads/decode_head.py:292-340 (loss_by_feat:
resize logits to GT, CE with ignore_index=255, avg over valid pixels) and
mmseg/models/losses/accuracy.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear


def pixel_cross_entropy(logits: jax.Array, sem_seg: jax.Array,
                        ignore_index: int = 255) -> jax.Array:
    """logits [B, h, w, K] (any resolution), sem_seg [B, H, W] int."""
    if logits.shape[1:3] != sem_seg.shape[1:3]:
        logits = resize_bilinear(logits, sem_seg.shape[1:3])
    valid = sem_seg != ignore_index
    labels = jnp.where(valid, sem_seg, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def pixel_accuracy(logits: jax.Array, sem_seg: jax.Array,
                   ignore_index: int = 255) -> jax.Array:
    if logits.shape[1:3] != sem_seg.shape[1:3]:
        logits = resize_bilinear(logits, sem_seg.shape[1:3])
    pred = jnp.argmax(logits, -1)
    valid = sem_seg != ignore_index
    correct = (pred == sem_seg) & valid
    return jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)
