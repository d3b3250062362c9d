"""Multi-scale deformable attention (MSDeformAttn) sampling core.

TPU-native equivalent of mmcv's ``ms_deform_attn`` CUDA op
(reference: mmdet/models/layers/transformer/mmcv_spike/
multi_scale_deform_attn.py:19-22 loads the prebuilt extension;
``multi_scale_deformable_attn_pytorch`` is the grid_sample fallback).
Used by the deformable-DETR layer stacks (inactive in the shipped
Spike2Former configs, provided for the full API surface).

Same gather-free strategy as ``ops/dcnv3.py``: each sample is a two-tap
row/column selector contraction per pyramid level, vectorized over
(batch x heads).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _selector(pos: jax.Array, size: int, dtype) -> jax.Array:
    """Two-tap bilinear selector [..., size]; out-of-range taps vanish."""
    p0 = jnp.floor(pos)
    frac = (pos - p0).astype(dtype)
    i0 = p0.astype(jnp.int32)
    iota = jnp.arange(size, dtype=jnp.int32).reshape(
        (1,) * pos.ndim + (size,))
    i0e = i0[..., None]
    s0 = (iota == i0e).astype(dtype)
    s1 = (iota == i0e + 1).astype(dtype)
    return s0 * (1.0 - frac)[..., None] + s1 * frac[..., None]


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn(
    value: jax.Array,               # [B, sum(H*W), heads, dim]
    spatial_shapes: tuple,          # ((H0, W0), (H1, W1), ...)
    sampling_locations: jax.Array,  # [B, Nq, heads, L, P, 2] in [0, 1] (x,y)
    attention_weights: jax.Array,   # [B, Nq, heads, L, P]
) -> jax.Array:
    """Returns [B, Nq, heads*dim] — numerically equivalent to mmcv's
    ``multi_scale_deformable_attn_pytorch`` (grid_sample with
    align_corners=False, zero padding)."""
    b, _, heads, dim = value.shape
    nq = sampling_locations.shape[1]
    num_levels = len(spatial_shapes)
    dt = value.dtype

    # split the flattened value into levels
    sizes = [h * w for h, w in spatial_shapes]
    offsets = [0]
    for s in sizes[:-1]:
        offsets.append(offsets[-1] + s)

    out = jnp.zeros((b, heads, nq, dim), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        val = jax.lax.dynamic_slice_in_dim(value, offsets[lvl], sizes[lvl],
                                           axis=1)
        # [B, heads, H, W*dim] (dim fastest)
        val = val.reshape(b, h, w, heads, dim).transpose(0, 3, 1, 2, 4)
        val = val.reshape(b, heads, h, w * dim)

        loc = sampling_locations[:, :, :, lvl]  # [B, Nq, heads, P, 2]
        px = loc[..., 0] * w - 0.5
        py = loc[..., 1] * h - 0.5
        # [B, heads, Nq, P, *]
        px = px.transpose(0, 2, 1, 3)
        py = py.transpose(0, 2, 1, 3)
        wgt = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)

        rows = _selector(py, h, dt) * wgt.astype(dt)[..., None]
        cols = _selector(px, w, dt)  # [B, heads, Nq, P, W]

        # contract rows with the level map: [B, heads, Nq, P, W*dim]
        g = jnp.einsum("bhqpu,bhuv->bhqpv", rows, val,
                       preferred_element_type=jnp.float32)
        g = g.reshape(b, heads, nq, rows.shape[3], w, dim)
        out = out + jnp.einsum("bhqpv,bhqpvd->bhqd",
                               cols.astype(jnp.float32), g)

    return out.transpose(0, 2, 1, 3).reshape(b, nq, heads * dim).astype(dt)
