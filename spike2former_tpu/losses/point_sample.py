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

TPU design: irregular point access is the enemy here — a scalar
gather's backward is a scalar scatter-add, which Mosaic/XLA serialize
(measured: the flagship point-loss train step ran at 13.3 s/iter, ~70x
the dense path, almost entirely scatter).  So the gradient-carrying
sampling (``point_sample``) is formulated as separable one-hot selector
MATMULS — the same design as the DCNv3 Pallas kernel: per point build a
[P, H] row selector and [P, W] column selector holding the two bilinear
tap weights (an out-of-range tap matches no row/column and contributes
exactly 0 = grid_sample zero padding), then ``out = (Ry @ M) . Cx``.
Forward and backward are batched MXU contractions; the mask gradient is
the transpose matmul ``Ry^T @ (dOut * Cx)`` — no scatter anywhere.
P is chunked (lax.map + checkpoint) with the chunk size derived from a
byte budget so the [N, Pc, W] intermediate stays bounded at any N.

Shared-coordinate sampling (the matching costs: one point set per image
for every query/slot) instead gathers [1, Q]-row slices of the
HW-transposed masks — contiguous vector loads, no per-query scalars
(``point_sample_shared``).  Slot-map ground truth
(criterion.GroundTruth) is sampled without materializing per-slot
binary masks: the 4 gathered *slot ids* are compared against each slot
index under the same lerp weights, bit-equal to bilinearly sampling the
dense {0,1} mask; GT carries no gradient, so these stay cheap forward
gathers.  At the flagship recipe this evaluates mask losses on 12.5k
points instead of 512^2 pixels per decoder layer.
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


def _selectors(coords: jax.Array, h: int, w: int):
    """Separable bilinear selector matrices for normalized (x, y) coords:
    [..., P, 2] -> (ry [..., P, h], cx [..., P, w]) f32.  A tap index
    outside [0, size) matches no grid row/column, so its contribution is
    exactly 0 — grid_sample's zero padding for free."""
    x = coords[..., 0].astype(jnp.float32) * w - 0.5
    y = coords[..., 1].astype(jnp.float32) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)[..., None]
    y0 = y0.astype(jnp.int32)[..., None]
    iy = jnp.arange(h, dtype=jnp.int32)
    ix = jnp.arange(w, dtype=jnp.int32)
    ry = (jnp.where(iy == y0, 1.0 - wy, 0.0)
          + jnp.where(iy == y0 + 1, wy, 0.0))
    cx = (jnp.where(ix == x0, 1.0 - wx, 0.0)
          + jnp.where(ix == x0 + 1, wx, 0.0))
    return ry, cx


def point_sample(masks: jax.Array, coords: jax.Array, *,
                 chunk: int | None = None, budget_bytes: int = 256 << 20,
                 dtype=None) -> jax.Array:
    """mmcv ``point_sample`` (grid_sample, align_corners=False, zero pad).

    masks [..., H, W]; coords [..., P, 2] normalized (x, y) in [0, 1] with
    identical leading dims.  Returns [..., P] in f32.

    Computed as separable selector matmuls (module docstring): both the
    forward and the mask gradient are MXU contractions — no gather in the
    forward, no scatter in the backward.  The point axis is chunked
    (lax.map + checkpoint) so the [N, Pc, W] selector intermediate stays
    within ``budget_bytes`` (default 256 MB — at the flagship per-pair
    loss shape N=B*G=512, W=256, f32 that is Pc=512; a fixed chunk would
    silently scale peak HBM with N).  ``chunk`` overrides the derived
    size.

    ``dtype`` sets the contraction input dtype (accumulation stays f32).
    bf16 doubles MXU rate and halves the selector-build traffic at ~3
    decimal digits of lerp-weight precision — right for stop-gradient
    consumers (uncertainty ranking, matching costs, {0,1} GT targets);
    keep the f32 default where sampled values carry gradients.
    """
    *lead, h, w = masks.shape
    p = coords.shape[-2]
    ct = dtype or jnp.float32
    m = masks.astype(ct).reshape(-1, h, w)
    n = max(m.shape[0], 1)
    cf = coords.astype(jnp.float32).reshape(n, p, 2)
    if chunk is None:
        itemsize = jnp.dtype(ct).itemsize
        chunk = max(128, budget_bytes // (n * max(h, w) * itemsize))
        chunk = min(chunk, p)
        # multiple of 128 keeps every chunk lane-aligned
        chunk = max(128, (chunk // 128) * 128)

    @jax.checkpoint
    def sample(c):
        ry, cx = _selectors(c, h, w)
        tmp = jnp.einsum("nph,nhw->npw", ry.astype(ct), m,
                         preferred_element_type=jnp.float32)
        return (tmp * cx).sum(-1)

    if p <= chunk:
        out = sample(cf)
    else:
        nc = -(-p // chunk)
        pad = nc * chunk - p
        cp = jnp.pad(cf, ((0, 0), (0, pad), (0, 0)))
        cc = cp.reshape(n, nc, chunk, 2).swapaxes(0, 1)
        out = jax.lax.map(sample, cc)  # [nc, n, chunk]
        out = out.swapaxes(0, 1).reshape(n, nc * chunk)[:, :p]
    return out.reshape(*lead, p)


def point_sample_shared(masks: jax.Array, coords: jax.Array) -> jax.Array:
    """Point-sample every mask of a stack at ONE shared point set.

    masks [B, Q, H, W]; coords [B, P, 2] shared across Q.  Returns
    [B, Q, P] f32, identical to ``point_sample`` with coords broadcast to
    [B, Q, P, 2] — but each tap gathers a contiguous [1, Q] row of the
    HW-transposed masks (vector loads) instead of B*Q*P scalars.
    """
    b, q, h, w = masks.shape
    p = coords.shape[-2]
    flat = masks.astype(jnp.float32).reshape(b, q, h * w)
    flat = flat.swapaxes(1, 2)  # [b, hw, q]
    out = jnp.zeros((b, p, q), jnp.float32)
    for yi, xi, wgt, inb in _taps(coords.reshape(b, p, 2), h, w):
        idx = yi * w + xi  # [b, p]
        v = jax.vmap(lambda t, i: t[i])(flat, idx)  # [b, p, q] row slices
        out = out + jnp.where(inb[..., None], v, 0.0) * wgt[..., None]
    return out.swapaxes(1, 2)


def point_sample_slot(slot_map: jax.Array, num_slots: int,
                      coords: jax.Array, *, dtype=None) -> jax.Array:
    """Bilinearly point-sample every slot's binary mask from a slot map.

    slot_map [B, H, W] int32 (pixel -> slot, ``num_slots`` = background);
    coords either [B, P, 2] (shared across slots) or [B, G, P, 2]
    (per-pair points).  Returns [B, G, P] f32, equal to
    ``point_sample(dense_masks, coords)``.

    TPU formulations (both replaced 4-tap ``take_along_axis`` scalar
    gathers, measured 610 ms/layer at the flagship per-pair shape —
    ~100M scalar gathers/s is the XLA-TPU gather ceiling):

    * per-pair: one-hot selector MATMULS over dense per-slot {0,1} masks
      (``point_sample``; masks exact in any float dtype) — MXU-bound.
      ``dtype`` is the contraction dtype (f32 default = bit-exact
      bilinear; the train criterion passes bf16 for these stop-gradient
      targets: only boundary-straddling points get fractional values and
      the ~0.4% lerp-weight rounding is far below the losses'
      sensitivity).
    * shared coords: the 2x2 slot-id neighborhood (ids < 255) of the
      1px-padded map is packed into ONE int32 table entry, so each point
      costs a single gather instead of four; 255 marks out-of-bounds and
      never matches a slot (grid_sample zero padding).  Exact.
    """
    b, h, w = slot_map.shape
    g = num_slots
    per_pair = coords.ndim == 4
    p = coords.shape[-2]
    if per_pair:
        slots = jnp.arange(g, dtype=slot_map.dtype)
        ct = dtype or jnp.float32
        dense = (slot_map[:, None] == slots[None, :, None, None]).astype(ct)
        return point_sample(dense, coords, dtype=ct)

    sp = jnp.pad(slot_map.astype(jnp.uint32), ((0, 0), (1, 1), (1, 1)),
                 constant_values=255)
    tab = (sp[:, :-1, :-1]
           | (sp[:, :-1, 1:] << 8)
           | (sp[:, 1:, :-1] << 16)
           | (sp[:, 1:, 1:] << 24)).astype(jnp.int32)
    tw = w + 1
    flat = tab.reshape(b, (h + 1) * tw)
    cf = coords.astype(jnp.float32)
    y0 = jnp.floor(cf[..., 1] * h - 0.5).astype(jnp.int32)
    x0 = jnp.floor(cf[..., 0] * w - 0.5).astype(jnp.int32)
    # y0 in [-1, h-1], x0 in [-1, w-1] for coords in [0, 1] -> +1 indexes
    # the padded table in range
    idx = (y0 + 1) * tw + (x0 + 1)
    # coords beyond [0, 1] can push idx out of the padded table; the
    # clamped gather may then read real slot ids, so keep the per-tap
    # ``inb`` mask (for in-range coords the 255 marker already suffices)
    idx = jnp.clip(idx, 0, (h + 1) * tw - 1)
    packed = jnp.take_along_axis(flat, idx, axis=1).astype(jnp.uint32)
    ids = ((packed & 0xFF), (packed >> 8) & 0xFF,
           (packed >> 16) & 0xFF, (packed >> 24) & 0xFF)
    slots = jnp.arange(g, dtype=jnp.uint32)
    out = jnp.zeros((b, g, p), jnp.float32)
    for sid, (yi, xi, wgt, inb) in zip(ids, _taps(cf, h, w)):
        hit = (sid[:, None, :] == slots[None, :, None]) & inb[:, None, :]
        out = out + jnp.where(hit, 1.0, 0.0) * wgt[:, None, :]
    return out


def get_uncertainty(logits: jax.Array) -> jax.Array:
    """Class-agnostic uncertainty: -|logit| (point_sample.py:7-31 with a
    single channel / labels=None)."""
    return -jnp.abs(logits)


def uncertain_point_coords(rng: jax.Array, mask_logits: jax.Array,
                           num_points: int, oversample_ratio: float = 3.0,
                           importance_sample_ratio: float = 0.75,
                           *, dtype=None) -> jax.Array:
    """``get_uncertain_point_coords_with_randomness`` (point_sample.py:
    34-88): oversample uniform points, keep the ``importance`` fraction
    with the most uncertain *sampled* logits, refill with fresh uniforms.

    mask_logits [..., H, W] -> coords [..., num_points, 2].  Pure given
    ``rng``; callers stop-gradient the logits (the reference computes
    coords under no_grad).

    TPU notes: the top-k selection co-sorts the (x, y) coordinate
    operands with the uncertainty key in ONE ``lax.sort`` — selecting
    via top_k indices + ``take_along_axis`` is the same math but the
    [..., k, 2] coordinate gather measured minutes/call at flagship
    shapes (axis=-2 scalar gathers).  ``dtype`` feeds the inner
    ``point_sample`` (bf16 halves the one-hot sampling cost; uncertainty
    only RANKS points, so lerp rounding can at most swap near-tied
    selections — same class of tie-break freedom top_k already has).
    """
    assert oversample_ratio >= 1
    assert 0 <= importance_sample_ratio <= 1
    lead = mask_logits.shape[:-2]
    n_sampled = int(num_points * oversample_ratio)
    n_imp = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_imp
    r1, r2 = jax.random.split(rng)
    coords = jax.random.uniform(r1, (*lead, n_sampled, 2), jnp.float32)
    unc = get_uncertainty(point_sample(mask_logits, coords, dtype=dtype))
    # descending sort by -uncertainty == top_k selection (ties reordered)
    _, sx, sy = jax.lax.sort(
        (-unc, coords[..., 0], coords[..., 1]), num_keys=1)
    sel = jnp.stack([sx[..., :n_imp], sy[..., :n_imp]], axis=-1)
    if n_rand > 0:
        sel = jnp.concatenate(
            [sel, jax.random.uniform(r2, (*lead, n_rand, 2), jnp.float32)],
            axis=-2)
    return sel
