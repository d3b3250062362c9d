"""Whole-image and sliding-window inference, fully on device.

Reference: mmseg/models/segmentors/encoder_decoder.py —
``whole_inference`` (:299-319), ``slide_inference`` (:246-297, crop grid +
logit accumulation with a count matrix), and ``BaseSegmentor.
postprocess_result`` (base.py:127-200: unpad → unflip → resize to ori shape
→ argmax).

TPU design: the slide grid is unrolled at trace time (static crop/stride →
static number of windows), each window runs the same jitted forward, and
accumulation stays on device — no per-window host sync and no recompiles,
because every window has the same static shape.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.segmentor import Spike2Former, preprocess
from ..ops.resize import resize_bilinear


def whole_logits(model: Spike2Former, variables, images_u8: jax.Array
                 ) -> jax.Array:
    """[B, H, W, 3] uint8 RGB → [B, H, W, num_classes] logits."""
    x = preprocess(images_u8)
    return model.apply(variables, x, method=Spike2Former.predict_logits)


def slide_logits(model: Spike2Former, variables, images_u8: jax.Array,
                 crop_size: tuple[int, int], stride: tuple[int, int],
                 num_classes: int) -> jax.Array:
    """Sliding-window logits with overlap averaging
    (encoder_decoder.py:246-297).

    Window positions follow the reference exactly: steps of ``stride``,
    clamped so the final window touches the image edge.
    """
    b, h, w, _ = images_u8.shape
    ch, cw = crop_size
    sh, sw = stride
    x = preprocess(images_u8)

    h_grids = max((h - ch + sh - 1) // sh, 0) + 1
    w_grids = max((w - cw + sw - 1) // sw, 0) + 1

    preds = jnp.zeros((b, h, w, num_classes), jnp.float32)
    count = jnp.zeros((b, h, w, 1), jnp.float32)

    fwd = functools.partial(
        model.apply, variables, method=Spike2Former.predict_logits)

    for hi in range(h_grids):
        for wi in range(w_grids):
            y1 = min(hi * sh, max(h - ch, 0))
            x1 = min(wi * sw, max(w - cw, 0))
            crop = jax.lax.dynamic_slice(
                x, (0, y1, x1, 0), (b, min(ch, h), min(cw, w), 3))
            logits = fwd(crop)
            preds = jax.lax.dynamic_update_slice(
                preds,
                jax.lax.dynamic_slice(
                    preds, (0, y1, x1, 0),
                    logits.shape) + logits,
                (0, y1, x1, 0))
            count = jax.lax.dynamic_update_slice(
                count,
                jax.lax.dynamic_slice(count, (0, y1, x1, 0),
                                      logits.shape[:3] + (1,)) + 1.0,
                (0, y1, x1, 0))
    return preds / jnp.maximum(count, 1.0)


def postprocess_pred(logits: jax.Array, pad_shape: tuple[int, int] | None,
                     ori_shape: tuple[int, int], flip: bool = False
                     ) -> jax.Array:
    """Crop padding, un-flip, resize to original shape, argmax
    (base.py:127-200).  logits: [B, H, W, C] → [B, oh, ow] int32."""
    if pad_shape is not None:
        logits = logits[:, :pad_shape[0], :pad_shape[1]]
    if flip:
        logits = logits[:, :, ::-1]
    if logits.shape[1:3] != tuple(ori_shape):
        logits = resize_bilinear(logits, tuple(ori_shape))
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
