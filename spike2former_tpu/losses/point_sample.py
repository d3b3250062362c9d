"""Point-sampled mask losses (the Mask2Former training ingredient).

Reference: mmdet/models/utils/point_sample.py:1-88
(``get_uncertainty``, ``get_uncertain_point_coords_with_randomness``) and
the point-sampled matching/loss recipe of
mmdet/models/tracking_heads/mask2former_track_head.py:300-436 —
matching costs evaluated on one shared uniform point set per image, mask
losses on per-pair uncertainty-importance-sampled points (K = 12544,
oversample 3.0, importance 0.75 upstream).

``point_sample`` reproduces mmcv's op exactly: bilinear ``grid_sample``
with ``align_corners=False`` and zero padding at normalized (x, y)
coordinates in [0, 1]^2 (source coordinate ``p * size - 0.5``; an
out-of-bounds neighbor contributes 0).

TPU design: sampling is 4 gathers + a lerp, fused by XLA into the loss
elementwise code.  For slot-map ground truth (criterion.GroundTruth) the
per-slot binary target is never materialized: the 4 gathered *slot ids*
are compared against each slot index under the same lerp weights, which
is bit-equal to bilinearly sampling the dense {0,1} mask.  At the
flagship recipe this evaluates mask losses on 12.5k points instead of
512^2 pixels — ~20x less loss-path work per decoder layer than the exact
GT-resolution path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _taps(coords: jax.Array, h: int, w: int):
    """Bilinear taps for normalized (x, y) coords: 4x (iy, ix, weight,
    in-bounds).  coords [..., P, 2] in [0, 1]."""
    x = coords[..., 0].astype(jnp.float32) * w - 0.5
    y = coords[..., 1].astype(jnp.float32) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    out = []
    for dy, dx, wgt in ((0, 0, (1 - wy) * (1 - wx)), (0, 1, (1 - wy) * wx),
                        (1, 0, wy * (1 - wx)), (1, 1, wy * wx)):
        yi, xi = y0 + dy, x0 + dx
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        out.append((jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1),
                    wgt, inb))
    return out


def point_sample(masks: jax.Array, coords: jax.Array) -> jax.Array:
    """mmcv ``point_sample`` (grid_sample, align_corners=False, zero pad).

    masks [..., H, W]; coords [..., P, 2] normalized (x, y) in [0, 1] with
    identical leading dims (broadcast shared coords with jnp.broadcast_to).
    Returns [..., P] in f32.
    """
    *lead, h, w = masks.shape
    p = coords.shape[-2]
    flat = masks.astype(jnp.float32).reshape(-1, h * w)
    n = flat.shape[0]
    cf = coords.reshape(n, p, 2)
    out = jnp.zeros((n, p), jnp.float32)
    for yi, xi, wgt, inb in _taps(cf, h, w):
        v = jnp.take_along_axis(flat, yi * w + xi, axis=1)
        out = out + jnp.where(inb, v, 0.0) * wgt
    return out.reshape(*lead, p)


def point_sample_slot(slot_map: jax.Array, num_slots: int,
                      coords: jax.Array) -> jax.Array:
    """Bilinearly point-sample every slot's binary mask from a slot map.

    slot_map [B, H, W] int32 (pixel -> slot, ``num_slots`` = background);
    coords either [B, P, 2] (shared across slots) or [B, G, P, 2]
    (per-pair points).  Returns [B, G, P] f32 — bit-equal to
    ``point_sample(dense_masks, coords)`` without the [B, G, H, W] buffer.
    """
    b, h, w = slot_map.shape
    g = num_slots
    slots = jnp.arange(g, dtype=slot_map.dtype)
    per_pair = coords.ndim == 4
    p = coords.shape[-2]
    flat = slot_map.reshape(b, h * w)
    out = jnp.zeros((b, g, p), jnp.float32)
    for yi, xi, wgt, inb in _taps(coords, h, w):
        idx = (yi * w + xi).reshape(b, -1)
        s = jnp.take_along_axis(flat, idx, axis=1)
        if per_pair:
            s = s.reshape(b, g, p)
            hit = (s == slots[None, :, None])
            t = jnp.where(inb & hit, 1.0, 0.0) * wgt
        else:
            hit = (s[:, None, :] == slots[None, :, None])
            t = jnp.where(inb[:, None, :] & hit, 1.0, 0.0) * wgt[:, None, :]
        out = out + t
    return out


def get_uncertainty(logits: jax.Array) -> jax.Array:
    """Class-agnostic uncertainty: -|logit| (point_sample.py:7-31 with a
    single channel / labels=None)."""
    return -jnp.abs(logits)


def uncertain_point_coords(rng: jax.Array, mask_logits: jax.Array,
                           num_points: int, oversample_ratio: float = 3.0,
                           importance_sample_ratio: float = 0.75
                           ) -> jax.Array:
    """``get_uncertain_point_coords_with_randomness`` (point_sample.py:
    34-88): oversample uniform points, keep the ``importance`` fraction
    with the most uncertain *sampled* logits, refill with fresh uniforms.

    mask_logits [..., H, W] -> coords [..., num_points, 2].  Pure given
    ``rng``; callers stop-gradient the logits (the reference computes
    coords under no_grad).
    """
    assert oversample_ratio >= 1
    assert 0 <= importance_sample_ratio <= 1
    lead = mask_logits.shape[:-2]
    n_sampled = int(num_points * oversample_ratio)
    n_imp = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_imp
    r1, r2 = jax.random.split(rng)
    coords = jax.random.uniform(r1, (*lead, n_sampled, 2), jnp.float32)
    unc = get_uncertainty(point_sample(mask_logits, coords))
    _, idx = jax.lax.top_k(unc, n_imp)  # [..., n_imp]
    sel = jnp.take_along_axis(coords, idx[..., None], axis=-2)
    if n_rand > 0:
        sel = jnp.concatenate(
            [sel, jax.random.uniform(r2, (*lead, n_rand, 2), jnp.float32)],
            axis=-2)
    return sel
