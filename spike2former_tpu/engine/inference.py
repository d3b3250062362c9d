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
from ..ops.resize import resize_bilinear, resize_bilinear_hw


@functools.lru_cache(maxsize=64)
def _jitted_whole(model, with_valid):
    if with_valid:
        def impl(variables, images_u8, valid_hw):
            x = preprocess(images_u8)
            return model.apply(variables, x, valid_hw,
                               method=type(model).predict_logits)
    else:
        def impl(variables, images_u8):
            x = preprocess(images_u8)
            return model.apply(variables, x,
                               method=type(model).predict_logits)

    return jax.jit(impl)


def whole_logits(model: Spike2Former, variables, images_u8: jax.Array,
                 valid_hw=None) -> jax.Array:
    """[B, H, W, 3] uint8 RGB → [B, H, W, num_classes] logits.

    The jitted implementation is cached per model (flax modules hash by
    their static config), so repeated calls never retrace.  ``valid_hw``
    ([B, 2] int array) marks the valid region of bucket-padded inputs — it
    is a traced value, so all images sharing a bucket shape share ONE
    compilation.
    """
    if valid_hw is None:
        return _jitted_whole(model, False)(variables, images_u8)
    return _jitted_whole(model, True)(
        variables, images_u8, jnp.asarray(valid_hw, jnp.int32))


@functools.lru_cache(maxsize=16)
def _jitted_panoptic(model, num_things, object_mask_thr):
    from ..evaluation.tta import panoptic_inference

    def impl(variables, images_u8):
        x = preprocess(images_u8)
        cls_scores, mask_preds = model.apply(variables, x, False)
        mask = mask_preds[-1]
        hw = images_u8.shape[1:3]
        mask = resize_bilinear_hw(mask, hw)
        return panoptic_inference(cls_scores[-1], mask,
                                  object_mask_thr=object_mask_thr,
                                  num_things=num_things)

    return jax.jit(impl)


def whole_panoptic(model: Spike2Former, variables, images_u8: jax.Array,
                   num_things: int = 80, object_mask_thr: float = 0.8
                   ) -> tuple[jax.Array, jax.Array]:
    """[B, H, W, 3] uint8 RGB → (sem [B,H,W] i32 with -1 void,
    inst [B,H,W] i32) via the mask-classification panoptic merge."""
    return _jitted_panoptic(model, num_things, object_mask_thr)(
        variables, images_u8)


def bucket_hw(h: int, w: int, multiple: int = 128) -> tuple[int, int]:
    """Round spatial dims up to a bucket shape so keep-ratio eval images
    share a handful of compilations instead of one per distinct (H, W)."""
    return (-(-h // multiple) * multiple, -(-w // multiple) * multiple)


@functools.lru_cache(maxsize=64)
def _jitted_slide(model, crop_size, stride, num_classes, window_batch):
    def impl(variables, images_u8):
        return _slide_impl(model, variables, images_u8, crop_size, stride,
                           num_classes, window_batch)

    return jax.jit(impl)


def slide_logits(model: Spike2Former, variables, images_u8: jax.Array,
                 crop_size: tuple[int, int], stride: tuple[int, int],
                 num_classes: int, window_batch: int | None = None
                 ) -> jax.Array:
    """Cached-jit wrapper around the sliding-window implementation — one
    compilation per (model, crop, stride, image-shape)."""
    return _jitted_slide(model, tuple(crop_size), tuple(stride),
                         num_classes, window_batch)(variables, images_u8)


def _slide_impl(model: Spike2Former, variables, images_u8: jax.Array,
                crop_size: tuple[int, int], stride: tuple[int, int],
                num_classes: int, window_batch: int | None = None
                ) -> jax.Array:
    """Sliding-window logits with overlap averaging
    (encoder_decoder.py:246-297).

    Window positions follow the reference exactly (steps of ``stride``,
    clamped so the final window touches the image edge) — but all windows
    are *stacked into one batch* and run through a single forward (chunked
    by ``window_batch``), instead of the reference's Python loop of
    per-crop forwards: one compilation, full MXU batch efficiency, no
    per-window host sync.
    """
    import numpy as np

    b, h, w, _ = images_u8.shape
    ch, cw = min(crop_size[0], h), min(crop_size[1], w)
    sh, sw = stride
    x = preprocess(images_u8)

    h_grids = max(h - ch + sh - 1, 0) // sh + 1
    w_grids = max(w - cw + sw - 1, 0) // sw + 1
    origins = [(min(hi * sh, max(h - ch, 0)), min(wi * sw, max(w - cw, 0)))
               for hi in range(h_grids) for wi in range(w_grids)]
    nw = len(origins)
    origins_arr = jnp.asarray(origins, jnp.int32)  # [W, 2]

    # Crop extraction, forward, and accumulation all run as lax.scan over
    # the (static-length) window list, so the compiled program size stays
    # FLAT in the number of windows — the reference's slide handles
    # arbitrary grids (encoder_decoder.py:246-297) and e.g. a 4K image at
    # 512/341 is a 100+ window grid that an unrolled loop would turn into
    # a megabyte-scale HLO.
    def get_crop(_, o):
        return None, jax.lax.dynamic_slice(
            x, (0, o[0], o[1], 0), (b, ch, cw, 3))

    _, crops = jax.lax.scan(get_crop, None, origins_arr)  # [W, B, ch, cw, 3]
    crops = crops.reshape(-1, ch, cw, 3)

    fwd = functools.partial(
        model.apply, variables, method=type(model).predict_logits)
    # window chunking scaled by crop area: ~8 512x512-equivalents per chunk
    wb = window_batch or b * max(1, (8 * 512 * 512) // (ch * cw))
    total = nw * b
    pad = (-total) % wb
    if pad:
        crops = jnp.concatenate(
            [crops, jnp.zeros((pad, ch, cw, 3), crops.dtype)], axis=0)

    def fwd_chunk(_, cr):
        return None, fwd(cr)

    _, logits = jax.lax.scan(
        fwd_chunk, None, crops.reshape(-1, wb, ch, cw, 3))
    logits = logits.reshape(-1, ch, cw, num_classes)[:total].reshape(
        nw, b, ch, cw, num_classes)

    # overlap counts depend only on the static grid — fold to a constant
    count_np = np.zeros((1, h, w, 1), np.float32)
    for (y1, x1) in origins:
        count_np[:, y1:y1 + ch, x1:x1 + cw] += 1.0

    def accum(preds, xs):
        o, lg = xs
        patch = jax.lax.dynamic_slice(
            preds, (0, o[0], o[1], 0), (b, ch, cw, num_classes))
        return jax.lax.dynamic_update_slice(
            preds, patch + lg.astype(jnp.float32), (0, o[0], o[1], 0)), None

    preds = jnp.zeros((b, h, w, num_classes), jnp.float32)
    preds, _ = jax.lax.scan(accum, preds, (origins_arr, logits))
    return preds / jnp.asarray(np.maximum(count_np, 1.0))


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
